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
