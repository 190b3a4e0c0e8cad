"""CLI entry tests (in-process so the CPU-forced test env applies)."""

import csv
import json

import numpy as np
import pytest

from harmony_tpu.cli import main

from conftest import make_synthetic


@pytest.fixture()
def io_files(tmp_path):
    Z, meta = make_synthetic(None, n_cells=120, d=6, seed=0)
    emb = tmp_path / "emb.npy"
    np.save(emb, Z)
    meta_csv = tmp_path / "meta.csv"
    with open(meta_csv, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["dataset"])
        for v in meta["dataset"]:
            w.writerow([v])
    return str(emb), str(meta_csv), str(tmp_path / "out.npy")


def test_cli_run(io_files, capsys):
    emb, meta, out = io_files
    rc = main([
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--max-iter", "1",
    ])
    assert rc == 0
    arr = np.load(out)
    assert arr.shape == (120, 6)
    assert np.all(np.isfinite(arr))


def test_cli_run_rotate(io_files):
    emb, meta, out = io_files
    rc = main([
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--max-iter", "1",
        "--shuffle-mode", "rotate",
    ])
    assert rc == 0
    assert np.load(out).shape == (120, 6)


def test_cli_bench_json_line(capsys):
    rc = main([
        "bench", "--cells", "3000", "--dims", "6", "--batches", "2",
        "--nclust", "4", "--max-iter", "1",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "cells_per_sec_per_chip_per_harmony_iter"
    assert payload["value"] > 0


def test_cli_checkpoint_and_resume(io_files, tmp_path, capsys):
    emb, meta, out = io_files
    ckpt = str(tmp_path / "run.ckpt.npz")
    base = [
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--checkpoint", ckpt,
    ]
    rc = main(base + ["--max-iter", "1"])
    assert rc == 0
    import os

    assert os.path.exists(ckpt)
    first = np.load(out)

    # second invocation sees the checkpoint and resumes instead of
    # restarting (the crash-recovery CLI flow)
    rc = main(base + ["--max-iter", "2"])
    assert rc == 0
    assert "resuming" in capsys.readouterr().out
    resumed = np.load(out)
    assert resumed.shape == first.shape
    assert np.all(np.isfinite(resumed))


def test_cli_checkpoint_extension_normalized(io_files, tmp_path, capsys):
    """A --checkpoint path without .npz still round-trips: np.savez
    appends .npz, so the CLI must check the normalized name or crash
    recovery is silently inert (ADVICE r2)."""
    emb, meta, out = io_files
    ckpt = str(tmp_path / "run.ckpt")  # no .npz
    base = [
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--checkpoint", ckpt,
    ]
    rc = main(base + ["--max-iter", "1"])
    assert rc == 0
    import os

    assert os.path.exists(ckpt + ".npz")
    rc = main(base + ["--max-iter", "1"])
    assert rc == 0
    assert "resuming" in capsys.readouterr().out


def test_cli_resume_warns_on_ignored_flags(io_files, tmp_path, capsys):
    emb, meta, out = io_files
    ckpt = str(tmp_path / "run.ckpt.npz")
    base = [
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--checkpoint", ckpt,
    ]
    rc = main(base + ["--nclust", "4", "--max-iter", "1"])
    assert rc == 0
    capsys.readouterr()
    # changing --nclust on resume is ignored (config comes from the
    # checkpoint); the CLI must say so instead of silently running the
    # old hyperparameters
    rc = main(base + ["--nclust", "8", "--max-iter", "1"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "--nclust" in err and "ignor" in err


def test_cli_rotate_checkpoint_resume_matches_uninterrupted(
    io_files, tmp_path, capsys
):
    """Rotate-mode crash recovery (VERDICT r2 #6): the checkpoint stores
    the ingest-shuffle provenance (seed + tile), so a resume rebuilds the
    shuffled cell order from the original inputs. An interrupted-then-
    resumed rotate run must reproduce the uninterrupted run's embedding."""
    emb, meta, out = io_files
    base = [
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--seed", "3",
        "--shuffle-mode", "rotate",
    ]
    # uninterrupted 2-round run (no checkpoint)
    rc = main(base + ["--max-iter", "2"])
    assert rc == 0
    ref = np.load(out)

    # crash after 1 round, then resume for 1 more
    ckpt = str(tmp_path / "rot.npz")
    rc = main(base + ["--max-iter", "1", "--checkpoint", ckpt])
    assert rc == 0
    rc = main(base + ["--max-iter", "1", "--checkpoint", ckpt])
    assert rc == 0
    assert "resuming" in capsys.readouterr().out
    resumed = np.load(out)
    # ordering check is implicit: a wrong ingest permutation scrambles
    # cells and the comparison fails loudly
    np.testing.assert_allclose(resumed, ref, atol=5e-4)


def test_cli_bench_measures_production_path(capsys, monkeypatch):
    """VERDICT r3 weak #1: the packaged benchmark must measure the
    production rotate + Pallas path, not silently fall back to the
    reference-exact permute schedule."""
    monkeypatch.setenv("HARMONY_BENCH_PAIRS", "1")
    rc = main([
        "bench", "--cells", "4096", "--dims", "8", "--batches", "3",
        "--nclust", "6", "--max-iter", "1", "--estep-impl", "pallas",
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["shuffle_mode"] == "rotate"
    assert payload["estep_impl"] == "pallas"
    assert payload["value"] > 0


def test_cli_mesh_resume(tmp_path, capsys):
    """VERDICT r3 weak #2: a killed mesh run must resume ON the mesh
    (the checkpoint's replicated arrays are re-sharded) and match the
    uninterrupted meshed run; resuming without --mesh notes the
    single-device downgrade (ADVICE r3)."""
    # a workload that does NOT early-stop after round 1 (resume always
    # runs its additional rounds, so the uninterrupted reference must
    # genuinely run 2 rounds for the comparison to be meaningful)
    Z, meta_d = make_synthetic(None, n_cells=240, d=6, seed=2)
    emb = str(tmp_path / "emb.npy")
    np.save(emb, Z)
    meta = str(tmp_path / "meta.csv")
    with open(meta, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["dataset"])
        for v in meta_d["dataset"]:
            w.writerow([v])
    out = str(tmp_path / "out.npy")
    base = [
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--seed", "1", "--mesh", "auto",
    ]
    rc = main(base + ["--max-iter", "2"])
    assert rc == 0
    ref = np.load(out)

    ckpt = str(tmp_path / "mesh.npz")
    rc = main(base + ["--max-iter", "1", "--checkpoint", ckpt])
    assert rc == 0
    capsys.readouterr()
    rc = main(base + ["--max-iter", "1", "--checkpoint", ckpt])
    assert rc == 0
    cap = capsys.readouterr()
    assert "resuming" in cap.out
    assert "single-device" not in cap.err  # the mesh was honored
    np.testing.assert_allclose(np.load(out), ref, atol=5e-4)

    # resume WITHOUT --mesh: provenance-driven downgrade note
    nomesh = [a for a in base if a not in ("--mesh", "auto")]
    rc = main(nomesh + ["--max-iter", "1", "--checkpoint", ckpt])
    assert rc == 0
    assert "single-device" in capsys.readouterr().err


def test_cli_run_production_knobs(io_files, monkeypatch):
    """`run` exposes the recorded production configuration (VERDICT r4
    weak #4): --dtype/--estep-impl/--virtual-r reach run_harmony, and a
    --dtype bfloat16 run resolves true-bf16 matmuls end to end."""
    import harmony_tpu.api as api_mod

    captured = {}
    real = api_mod.run_harmony

    def spy(Z, meta, vars_use, **kw):
        captured.update(kw)
        res = real(Z, meta, vars_use, **{**kw, "return_object": True})
        captured["resolved_config"] = res.config
        return res.embeddings

    monkeypatch.setattr(api_mod, "run_harmony", spy)
    emb, meta, out = io_files
    rc = main([
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--max-iter", "1",
        "--dtype", "bfloat16", "--estep-impl", "xla", "--virtual-r", "off",
    ])
    assert rc == 0
    assert captured["dtype"] == "bfloat16"
    assert captured["estep_impl"] == "xla"
    assert captured["virtual_r"] is False
    cfg = captured["resolved_config"]
    assert cfg.matmul_precision == "bfloat16"  # auto-resolved by dtype
    assert cfg.virtual_r is False  # explicit off overrides the bf16 policy
    arr = np.load(out)
    assert arr.shape == (120, 6)
    # the CLI saves bf16 runs as float32 so the artifact loads in plain
    # numpy (raw bfloat16 .npy files need ml_dtypes to even parse)
    assert arr.dtype == np.float32
    assert np.all(np.isfinite(arr))

    # tri-state default: 'auto' passes None through (dtype policy decides)
    rc = main([
        "run", "--embeddings", emb, "--meta", meta, "--vars", "dataset",
        "--out", out, "--nclust", "4", "--max-iter", "1",
    ])
    assert rc == 0
    assert captured["virtual_r"] is None
    assert captured["estep_impl"] == "auto"
