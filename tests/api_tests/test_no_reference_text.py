"""Guard: no string literal in the build is shared with the reference
implementation's source tree (the reference is under a restrictive
licence; this build must carry none of its literal text)."""
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CHECKER = os.path.join(REPO_ROOT, "scripts", "check_ref_text.py")


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not present")
def test_no_literal_text_shared_with_reference():
    result = subprocess.run([sys.executable, CHECKER],
                            capture_output=True, text=True, check=False)
    assert result.returncode == 0, result.stdout + result.stderr


def test_checker_sees_line_split_literals():
    """The corpus normalizer must join implicit string concatenations:
    a literal the reference splits across lines ('"...part "' newline
    '"two..."') has to match the joined text, or the guard silently
    misses exactly the strings most likely to be copied (this blind
    spot shipped 11 verbatim strings through round 3's guard)."""
    sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
    import importlib.util
    spec = importlib.util.spec_from_file_location("_chk", CHECKER)
    chk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(chk)

    raw = 'raise ValueError("The first half of a message that is "\n' \
          '                 "split across two source lines.")'
    corpus = chk._normalize(chk._join_split_literals(raw))
    joined = chk._normalize(
        "The first half of a message that is split across two source "
        "lines.")
    assert joined in corpus

    # The juncture may also sit before an f-string continuation
    # ('"... " f"..."') -- round 4's joiner missed that form and one
    # verbatim literal slipped through it.
    raw_f = 'raise ValueError("A literal whose second half is an "\n' \
            '                 f"f-string piece with {value} inside.")'
    corpus_f = chk._normalize(chk._join_split_literals(raw_f))
    assert chk._normalize(
        "A literal whose second half is an f-string piece") in corpus_f


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not present")
def test_reference_corpus_contains_joined_literal():
    """End-to-end on the real corpus: a literal the reference source
    splits across lines (sorf_kernel_baseclass.py:68) must be findable
    as one joined string."""
    sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
    import importlib.util
    spec = importlib.util.spec_from_file_location("_chk2", CHECKER)
    chk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(chk)
    raw_corpus, joined_corpus = chk._reference_corpora()
    probe = chk._normalize(
        "The dimensionality of the input is inappropriate for the "
        "kernel you have selected.")
    assert probe in joined_corpus
    assert probe not in raw_corpus  # only findable once joined
