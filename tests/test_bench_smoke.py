"""bench.py end-to-end smoke test on CPU.

The driver runs bench.py unattended on the real chip at end of round; a
script-level regression (import error, phase logic, JSON shape) would
silently cost the round's recorded number (round 2 was lost to exactly
one unguarded failure mode).  This runs the whole script at toy sizes on
the CPU backend and validates the output contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_script_emits_valid_json(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env.update(
        BENCH_READS="256",
        BENCH_GENOME="20000",
        BENCH_GENOME_HC="40000",
        BENCH_ITERS="2",
        BENCH_DEADLINE_S="240",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {proc.stdout!r}"
    out = json.loads(lines[0])
    assert out["metric"] == "kmers_per_sec_per_chip_k31"
    assert out["unit"] == "kmers/s"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0
    # every phase must have produced a measurement (the two-level phases
    # fall back to consolidate2 on CPU but still run end-to-end)
    assert "one-level:" in proc.stderr
    assert "two-level-fused:" in proc.stderr
    assert "two-level-bitonic:" in proc.stderr
    assert "two-level-hc:" in proc.stderr
    # the high-cardinality side metric is recorded on stderr only
    assert "kmers_per_sec_per_chip_k31_highcard" in proc.stderr


def test_bench_scaling_smoke():
    """benchmarks/bench_scaling.py correct-shape check on the CPU mesh
    (VERDICT r4 item 5: the harness exists and emits the schema the day
    real multi-chip hardware appears)."""
    import jax

    from benchmarks.bench_scaling import run_scaling

    assert len(jax.devices()) >= 8
    summary = run_scaling(
        [1, 2, 8],
        reads_per_device=64,
        line_length=60,
        chunks=2,
        warmup=1,
    )
    assert summary["metric"] == "scaling"
    assert [r["devices"] for r in summary["results"]] == [1, 2, 8]
    for r in summary["results"]:
        assert r["kmers_per_s"] > 0
        assert r["efficiency"] > 0
    assert summary["results"][0]["efficiency"] == 1.0
