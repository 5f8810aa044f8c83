"""Offline dataset content validation and ragged (variable sequence-axis)
file support.

Reference parity: per-file NaN / magnitude checks with a
skip_safety_checks opt-out (dataset_builder.py:264-307), and 3d .npy
batches whose shape[1] differs file-to-file (dataset_builder.py:282-291,
HISTORY v0.1.2.2) -- a ragged corpus must fit without pre-padding and
match the pre-padded equivalent exactly.
"""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset


def _write_blocks(tmp_path, blocks, prefix="b"):
    """blocks: list of (x, y, seqlen-or-None); returns file lists."""
    xfiles, yfiles, lfiles = [], [], []
    for i, (x, y, l) in enumerate(blocks):
        xf = tmp_path / f"{prefix}{i}_x.npy"
        yf = tmp_path / f"{prefix}{i}_y.npy"
        np.save(xf, x)
        np.save(yf, y)
        xfiles.append(str(xf))
        yfiles.append(str(yf))
        if l is not None:
            lf = tmp_path / f"{prefix}{i}_l.npy"
            np.save(lf, l)
            lfiles.append(str(lf))
    return xfiles, yfiles, (lfiles if lfiles else None)


def _ragged_blocks(seed=0, dims1=(6, 11, 9), d=5):
    rng = np.random.default_rng(seed)
    blocks = []
    for dim1 in dims1:
        n = 40
        x = rng.standard_normal((n, dim1, d))
        l = rng.integers(2, dim1 + 1, size=n).astype(np.int32)
        for j, lj in enumerate(l):
            x[j, lj:] = 0.0
        y = rng.standard_normal(n)
        blocks.append((x, y, l))
    return blocks


def test_nan_file_rejected_at_build(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 4))
    x[3, 2] = np.nan
    y = rng.standard_normal(20)
    xf, yf, _ = _write_blocks(tmp_path, [(x, y, None)])
    with pytest.raises(RuntimeError, match="NaN"):
        build_regression_dataset(xf, yf)


def test_extreme_values_rejected_at_build(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((20, 4))
    x[0, 0] = 2e15
    y = rng.standard_normal(20)
    xf, yf, _ = _write_blocks(tmp_path, [(x, y, None)])
    with pytest.raises(RuntimeError, match="1e15"):
        build_regression_dataset(xf, yf)


def test_skip_safety_checks_bypasses_content_scan(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((20, 4))
    x[3, 2] = np.nan
    y = rng.standard_normal(20)
    xf, yf, _ = _write_blocks(tmp_path, [(x, y, None)])
    dset = build_regression_dataset(xf, yf, skip_safety_checks=True)
    assert dset.get_ndatapoints() == 20


def test_bad_length_file_rejected(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((10, 8, 3))
    y = rng.standard_normal(10)
    l = np.full(10, 9, dtype=np.int32)  # exceeds dim1
    xf, yf, lf = _write_blocks(tmp_path, [(x, y, l)])
    with pytest.raises(RuntimeError, match="lengths"):
        build_regression_dataset(xf, yf, lf)


def test_ragged_files_accepted_and_xdim_is_max(tmp_path):
    blocks = _ragged_blocks()
    xf, yf, lf = _write_blocks(tmp_path, blocks)
    dset = build_regression_dataset(xf, yf, lf, chunk_size=64)
    assert dset.get_xdim() == (120, 11, 5)
    # padded batches all share the max dim1 and mask out pad rows
    shapes = {xb.shape for xb, _, _, _ in dset.padded_batches()}
    assert shapes == {(64, 11, 5)}


def test_ragged_2d_files_still_rejected(tmp_path):
    rng = np.random.default_rng(5)
    blocks = [(rng.standard_normal((10, 4)), rng.standard_normal(10), None),
              (rng.standard_normal((10, 5)), rng.standard_normal(10), None)]
    xf, yf, _ = _write_blocks(tmp_path, blocks)
    with pytest.raises(RuntimeError, match="inconsistent"):
        build_regression_dataset(xf, yf)


def test_sequence_pad_override_matches_prepadded(tmp_path):
    """set_sequence_pad (the multi-host ragged reconciliation hook) must
    make padded_batches emit exactly what a corpus pre-padded to that
    length would."""
    blocks = _ragged_blocks()
    target = 15
    padded_blocks = []
    for x, y, l in blocks:
        xp = np.zeros((x.shape[0], target, x.shape[2]))
        xp[:, :x.shape[1]] = x
        padded_blocks.append((xp, y, l))

    xf, yf, lf = _write_blocks(tmp_path, blocks, prefix="rag")
    xfp, yfp, lfp = _write_blocks(tmp_path, padded_blocks, prefix="pad")
    ragged = build_regression_dataset(xf, yf, lf, chunk_size=64)
    prepad = build_regression_dataset(xfp, yfp, lfp, chunk_size=64)

    ragged.set_sequence_pad(target)
    assert ragged.padded_seq_len() == target
    assert ragged.get_padded_xdim() == (120, target, 5)
    with pytest.raises(ValueError):
        ragged.set_sequence_pad(4)  # below the dataset's own max

    for (xa, ya, la, ma), (xb, yb, lb, mb) in zip(
            ragged.padded_batches(), prepad.padded_batches()):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(la, lb)


def test_ragged_fit_matches_prepadded(tmp_path):
    """A fit on ragged files must equal the same fit on files pre-padded
    to the global max sequence length (masked windows contribute
    nothing)."""
    blocks = _ragged_blocks()
    max_dim1 = max(b[0].shape[1] for b in blocks)
    padded_blocks = []
    for x, y, l in blocks:
        xp = np.zeros((x.shape[0], max_dim1, x.shape[2]))
        xp[:, :x.shape[1]] = x
        padded_blocks.append((xp, y, l))

    xf, yf, lf = _write_blocks(tmp_path, blocks, prefix="rag")
    xfp, yfp, lfp = _write_blocks(tmp_path, padded_blocks, prefix="pad")
    ragged = build_regression_dataset(xf, yf, lf, chunk_size=64)
    prepad = build_regression_dataset(xfp, yfp, lfp, chunk_size=64)

    preds = []
    for dset in (ragged, prepad):
        model = GPRegression(num_rffs=128, kernel_choice="Conv1dRBF",
                             kernel_settings={"conv_width": 3},
                             verbose=False)
        model.set_hyperparams(np.log(np.array([0.1, 1.0])), dset)
        model.fit(dset, mode="exact", suppress_var=True)
        tex = blocks[0][0][:8]
        tel = blocks[0][2][:8]
        preds.append(np.asarray(model.predict(tex, sequence_lengths=tel)))
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-10, atol=1e-10)
