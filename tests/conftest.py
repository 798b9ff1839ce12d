"""Test configuration: force CPU with 8 virtual devices.

Multi-device tests simulate a TPU mesh on CPU the standard JAX way
(--xla_force_host_platform_device_count), per SURVEY.md §4.

Note: this environment's sitecustomize registers the tunneled 'axon' TPU
plugin and sets jax.config jax_platforms='axon,cpu', which overrides the
JAX_PLATFORMS env var — so we must override back through jax.config *before
any backend initializes*, or every test process pays a (flaky, up to minutes)
remote-TPU handshake.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

def pytest_addoption(parser):
    parser.addoption("--regen-golden", action="store_true",
                     help="regenerate golden snapshot PNGs")
