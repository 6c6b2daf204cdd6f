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
    # 127.0.0.1 with both relay ports closed (or refused fast) -> False.
    # If a live local relay is listening this box IS reachable; accept both
    # but require a boolean decision within the timeout.
    with mock.patch.dict(os.environ, {"PALLAS_AXON_POOL_IPS": "127.0.0.1"}):
        assert plat.tpu_reachable(timeout=2.0) in (True, False)


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
