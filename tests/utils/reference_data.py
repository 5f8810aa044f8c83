"""Loads the reference's own shipped test fixtures (read-only) so the
build can be gated on the reference's golden hyperparameters and
unmodified statistical thresholds (VERDICT r2 item 1).

Data layout (reference tests/test_data/): five ``{i}_block_test*`` blocks
plus one ``0_block_train*`` block, tabular (N x 84 fp64) and a conv
variant under conv_test/ (N x 4 x 21 fp64 + int32 seqlen).  The reference
test-suite loader is tests/utils/build_test_dataset.py:11-68 -- train
fixtures use the ``trainxvalues`` block, evaluation uses the
``testxvalues`` blocks.
"""
import os
import glob

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/tests/test_data"

# Golden hyperparameters from the reference's own tests.
CG_FIT_HPARAM = np.array([np.log(np.sqrt(0.0767)), np.log(0.358)])
PRECOND_HPARAM = np.array([-1.39209982, -1.00860899])
SLQ_EASY_HPARAMS = np.array([0.0, 1.0])
SLQ_HARD_HPARAMS = np.array([np.log(1e-3), 1.0])

requires_reference_data = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA),
    reason="reference shipped test_data not present on this machine")


def _file_blocks(conv=False, split="train"):
    droot = os.path.join(REFERENCE_DATA, "conv_test") if conv \
        else REFERENCE_DATA
    xfiles = sorted(glob.glob(os.path.join(
        droot, f"*_block_{split}xvalues.npy")))
    yfiles = [f.replace("xvalues", "yvalues") for f in xfiles]
    lfiles = [f.replace("xvalues", "seqlen") for f in xfiles] if conv \
        else None
    assert xfiles, f"no reference {split} blocks found under {droot}"
    return xfiles, yfiles, lfiles


def load_reference_arrays(conv=False, split="train"):
    """All blocks of one split concatenated into in-memory arrays."""
    xfiles, yfiles, lfiles = _file_blocks(conv, split)
    xvals = np.vstack([np.load(f) for f in xfiles])
    yvals = np.concatenate([np.load(f) for f in yfiles])
    seqlen = None
    if conv:
        seqlen = np.concatenate([np.load(f) for f in lfiles])
    return xvals, yvals, seqlen


def reference_dataset(conv=False, split="train", offline=False,
                      chunk_size=2000):
    """The reference's shipped fixture as one of this build's datasets."""
    from xgpr_tpu import build_regression_dataset
    if offline:
        xfiles, yfiles, lfiles = _file_blocks(conv, split)
        return build_regression_dataset(xfiles, yfiles, lfiles,
                                        chunk_size=chunk_size)
    xvals, yvals, seqlen = load_reference_arrays(conv, split)
    return build_regression_dataset(xvals, yvals, seqlen,
                                    chunk_size=chunk_size)


def spearman_vs_reference_testset(model, conv=False, get_var=True):
    """Held-out Spearman rho on the reference's test blocks.  Spearman is
    invariant to the monotone y normalisation the reference applies in
    its evaluate_model (tests/utils/evaluate_model.py:7-18), so raw test
    y-values are compared directly."""
    from scipy.stats import spearmanr
    tex, te_y, tel = load_reference_arrays(conv, split="test")
    if get_var:
        preds, _ = model.predict(tex, sequence_lengths=tel, get_var=True)
    else:
        preds = model.predict(tex, sequence_lengths=tel)
    return spearmanr(np.asarray(preds), te_y)[0]
