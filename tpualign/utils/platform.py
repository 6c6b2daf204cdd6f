"""Backend selection guards for tunneled-TPU environments.

On this image a site hook registers the tunneled TPU backend (an ``axon``
PJRT plugin) at interpreter startup and *scrubs* ``JAX_PLATFORMS`` from the
environment, so a process started with ``JAX_PLATFORMS=cpu`` still selects
the tunnel — and when the tunnel relay is down, the first ``jax.devices()``
blocks indefinitely dialing it.  Every user-facing entry point (CLI, bench)
therefore preflights here before any device query:

- ``TPUALIGN_PLATFORM`` (not scrubbed by the hook) force-pins a platform via
  the config API, which works even after the hook ran;
- otherwise, if a tunnel is configured (``PALLAS_AXON_POOL_IPS``) but its
  relay is unreachable, the process degrades to CPU with a warning instead
  of hanging.

The reference has no analog — its drivers run where they're launched
(``driver.cpp:20-35``); this is the failure-detection tier a tunneled
accelerator needs.
"""

from __future__ import annotations

import os
import sys


#: relay ports to dial, in order (module-level so tests can substitute a
#: guaranteed-closed port)
RELAY_PORTS = (8083, 8082)


def tpu_reachable(timeout: float = 5.0) -> bool:
    """True if no tunnel is configured, or its relay accepts a TCP dial."""
    import socket

    ip = os.environ.get("PALLAS_AXON_POOL_IPS", "")
    if not ip:
        return True  # no tunnel: local backend, let jax decide
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(
                (ip.split(",")[0], port), timeout=timeout
            ):
                return True
        except OSError:
            continue
    return False


def ensure_live_backend() -> None:
    """Pin a usable platform before the first device query.

    Must run after ``import jax`` (the config API is the only pin that
    survives the site hook) and before anything touches devices.
    """
    import jax

    pin = os.environ.get("TPUALIGN_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    # An env pin naming the tunneled platform (the image presets
    # JAX_PLATFORMS=axon ambiently) is NOT proof the tunnel is alive —
    # it still has to pass the probe; only cpu-only pins skip it.
    needs_tunnel = not pin or any(
        p.strip() and p.strip() != "cpu" for p in pin.split(",")
    )
    if needs_tunnel and not tpu_reachable():
        print(
            "tpualign: TPU tunnel relay unreachable - running on CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
    elif pin:
        jax.config.update("jax_platforms", pin)
