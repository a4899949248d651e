"""Profiling utilities: phase timing + jax.profiler trace capture."""

import glob
import time

import jax
import jax.numpy as jnp

from hibayes_tpu.utils import PhaseTimer, annotate, device_trace


def test_phase_timer_accumulates_and_reports():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.phases["a"] >= 0.02
    assert set(t.phases) == {"a", "b"}
    lines = []
    t.report(items={"a": 1000}, out=lines.append)
    assert len(lines) == 3 and "/s" in lines[1]


def test_device_trace_none_is_noop():
    with device_trace(None):
        pass


def test_device_trace_writes_profile(tmp_path):
    with device_trace(tmp_path):
        with annotate("matmul-phase"):
            x = jnp.ones((64, 64))
            jax.block_until_ready(x @ x)
    assert glob.glob(str(tmp_path / "**" / "*.xplane.pb"), recursive=True)
