"""bench.py harness logic (no chip): the kernel-fallback ladder.

The throughput numbers themselves are driver-measured on real hardware;
these tests pin the harness behavior that protects them — a failing new
kernel must step down the ladder and record the rung, and explicit A/B
runs must never silently change configuration.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_bench_train_falls_back_and_records_rung(monkeypatch):
    calls = []

    def fake_once():
        calls.append({
            k: os.environ.get(k)
            for k in ("RST_WAVEFRONT", "RST_FUSED_WGRAD",
                      "RST_FUSED_DROPOUT", "RST_CTC_KBLOCK")
        })
        if len(calls) < 4:
            raise RuntimeError("compile OOM")
        return {"train_utt_per_sec": 1.0}

    monkeypatch.setattr(bench, "_bench_train_once", fake_once)
    out = bench.bench_train()
    assert out["train_kernel_fallback"] == "legacy_kernels"
    # Rung env progression: default -> wavefront off -> wgrad off -> legacy.
    assert calls[0] == {"RST_WAVEFRONT": None, "RST_FUSED_WGRAD": None,
                        "RST_FUSED_DROPOUT": None, "RST_CTC_KBLOCK": None}
    assert calls[1]["RST_WAVEFRONT"] == "0"
    assert calls[1]["RST_FUSED_WGRAD"] is None
    assert calls[2]["RST_FUSED_WGRAD"] == "0"
    assert calls[3] == {"RST_WAVEFRONT": "0", "RST_FUSED_WGRAD": "0",
                        "RST_FUSED_DROPOUT": "0", "RST_CTC_KBLOCK": "8"}
    # The ladder's env vars must not leak out of bench_train.
    for k in ("RST_WAVEFRONT", "RST_FUSED_WGRAD", "RST_FUSED_DROPOUT",
              "RST_CTC_KBLOCK"):
        assert k not in os.environ


def test_bench_train_success_adds_no_fallback_key(monkeypatch):
    monkeypatch.setattr(bench, "_bench_train_once",
                        lambda: {"train_utt_per_sec": 2.0})
    out = bench.bench_train()
    assert "train_kernel_fallback" not in out


def test_bench_train_pinned_knob_disables_fallback(monkeypatch):
    """An explicit A/B run (any triage knob pinned by the caller) must fail
    loudly rather than silently re-running a different configuration."""
    monkeypatch.setenv("RST_FUSED_WGRAD", "0")

    def fake_once():
        raise RuntimeError("boom")

    monkeypatch.setattr(bench, "_bench_train_once", fake_once)
    with pytest.raises(RuntimeError, match="boom"):
        bench.bench_train()
    assert os.environ["RST_FUSED_WGRAD"] == "0"  # caller's pin untouched
