"""Dictionary-learning loop: convergence, determinism, and resume-from-
checkpoint byte-identity (SURVEY.md §5.2-6)."""

import json
import os

import numpy as np
import pytest

from lyssandra_spark.operators.learn import DictLearner
from lyssandra_spark.sources import synth


@pytest.fixture(scope="module")
def tdf(spark, sf_dir):
    return (
        synth.transcripts(spark, sf_dir)
        .orderBy("conv_id", "turn_idx")
        .limit(3000)
        .cache()
    )


def test_fit_reduces_rmse(spark, tdf, tmp_path):
    dl = DictLearner(n_atoms=64, k=5, n_epochs=4)
    D, hist = dl.fit(tdf, str(tmp_path / "ckpt"))
    assert D.shape == (64, 64)
    rmses = [h["rmse"] for h in hist]
    assert rmses[-1] < rmses[0]
    nrm = np.linalg.norm(D, axis=0)
    assert (nrm <= 1.0 + 1e-9).all() and (nrm > 0.1).all()


def test_fit_deterministic(spark, tdf, tmp_path):
    dl = DictLearner(n_atoms=32, k=4, n_epochs=2)
    D1, h1 = dl.fit(tdf, str(tmp_path / "a"))
    D2, h2 = dl.fit(tdf, str(tmp_path / "b"))
    assert np.allclose(D1, D2, rtol=1e-9, atol=1e-12)
    assert [h["rmse"] for h in h1] == pytest.approx([h["rmse"] for h in h2], rel=1e-9)


def test_resume_from_checkpoint_identical(spark, tdf, tmp_path):
    """Kill after epoch 2 of 4; resume must land on the same dictionary
    as an uninterrupted run (allclose; float summation order is fixed
    because partition stats are reduced in partition_id order)."""
    full_dir = str(tmp_path / "full")
    dl4 = DictLearner(n_atoms=32, k=4, n_epochs=4)
    D_full, hist_full = dl4.fit(tdf, full_dir)

    part_dir = str(tmp_path / "part")
    dl2 = DictLearner(n_atoms=32, k=4, n_epochs=2)
    dl2.fit(tdf, part_dir)  # simulated run killed after epoch 2
    # resume: same config, same ckpt dir
    D_res, hist_res = dl4.fit(tdf, part_dir)
    assert len(hist_res) == 2  # only epochs 3..4 re-ran
    assert np.allclose(D_full, D_res, rtol=1e-9, atol=1e-12)

    # lineage continuity: one block of partition rows per epoch
    with open(os.path.join(part_dir, "lineage.jsonl")) as f:
        stages = [json.loads(l)["stage"] for l in f]
    assert {f"epoch_{e}" for e in (1, 2, 3, 4)} == set(stages)


def test_resume_noop_when_complete(spark, tdf, tmp_path):
    d = str(tmp_path / "done")
    dl = DictLearner(n_atoms=32, k=4, n_epochs=2)
    D1, _ = dl.fit(tdf, d)
    D2, hist = dl.fit(tdf, d)
    assert hist == []  # nothing re-ran
    assert np.array_equal(D1, D2)
