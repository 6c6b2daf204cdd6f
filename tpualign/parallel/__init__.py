"""Multi-chip decomposition: mesh helpers and the strip-pipelined fill."""
