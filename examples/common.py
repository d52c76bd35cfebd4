"""Shared example setup: pins the CPU backend when running interactively so
eager ops don't pay the remote-TPU tunnel latency (kernels still jit to TPU
in production use)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("TROY_EXAMPLES_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
