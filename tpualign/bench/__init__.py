"""Benchmark harness: timing, GCUPS accounting, sweeps, TSV/JSON emitters."""
