"""The dead-relay backend guard (tpualign/utils/platform.py).

A tunneled-TPU process must never hang dialing a dead relay: the CLI and
bench preflight a TCP probe and degrade to CPU.  These tests only exercise
the decision logic — no device queries.
"""

import os
from unittest import mock

import jax

from tpualign.utils import platform as plat


def test_reachable_when_no_tunnel_configured():
    with mock.patch.dict(os.environ, {"PALLAS_AXON_POOL_IPS": ""}):
        assert plat.tpu_reachable() is True


def test_unreachable_when_relay_refuses():
    # Bind-then-close guarantees a port with nothing listening; the probe
    # must return False (refused) and decide within the timeout budget.
    import socket
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with mock.patch.dict(
        os.environ, {"PALLAS_AXON_POOL_IPS": "127.0.0.1"}
    ), mock.patch.object(plat, "RELAY_PORTS", (port,)):
        t0 = time.monotonic()
        assert plat.tpu_reachable(timeout=2.0) is False
        assert time.monotonic() - t0 < 2.5


def test_env_pin_wins_over_probe():
    # TPUALIGN_PLATFORM forces the config pin and skips the probe entirely
    before = jax.config.jax_platforms
    try:
        with mock.patch.dict(
            os.environ, {"TPUALIGN_PLATFORM": "cpu"}
        ), mock.patch.object(
            plat, "tpu_reachable", side_effect=AssertionError("probed")
        ):
            plat.ensure_live_backend()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)


def test_dead_relay_degrades_to_cpu():
    before = jax.config.jax_platforms
    env = {k: "" for k in ("TPUALIGN_PLATFORM", "JAX_PLATFORMS")}
    try:
        with mock.patch.dict(os.environ, env), mock.patch.object(
            plat, "tpu_reachable", return_value=False
        ):
            plat.ensure_live_backend()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)
