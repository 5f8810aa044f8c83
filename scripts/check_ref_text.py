#!/usr/bin/env python
"""Guard against literal text shared with the reference implementation.

The reference (/root/reference, jlparkI/xGPR) is under a restrictive
licence: this build must not carry its literal text.  This script
extracts every string literal (including docstrings) from the build's
Python sources, normalises whitespace, and fails if any literal of
MIN_WORDS or more words appears verbatim anywhere in the reference's
source tree.  Run from the repo root:

    python scripts/check_ref_text.py

Exit code 0 = clean, 1 = shared text found.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import ast
import os
import re
import sys

REPO_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "xgpr_tpu")
REFERENCE = "/root/reference"
MIN_WORDS = 10


def _normalize(text):
    return re.sub(r"\s+", " ", text).strip().lower()


def _join_split_literals(text):
    """Collapse implicit string concatenations in raw source text.

    A literal split across lines in the reference source
    (``"...part one "`` newline ``"part two..."`` -- or newline
    ``f"part two..."``, any quote style, any prefix letters) leaves a
    quote-whitespace-quote juncture in the corpus that would otherwise
    prevent the joined literal from ever matching.  Deleting those
    junctures reconstructs the literal's full text.

    The deletion is deliberately aggressive (it also eats quote pairs
    that genuinely appear INSIDE a literal's text, altering that
    literal), so matching runs against BOTH the joined and the raw
    corpus -- an intact literal always matches raw, a split one matches
    joined, and the over-deletion cannot open a blind spot.
    """
    return re.sub(r"[\"']\s*[fFrRbBuU]{0,3}[\"']", "", text)


def _reference_corpora():
    """(raw, split-literals-joined) normalised reference text."""
    chunks = []
    for root, _, files in os.walk(REFERENCE):
        for fname in files:
            if fname.endswith((".py", ".cpp", ".cu", ".h", ".rst", ".md",
                               ".txt", ".toml")):
                path = os.path.join(root, fname)
                try:
                    with open(path, encoding="utf-8",
                              errors="replace") as fh:
                        chunks.append(fh.read())
                except OSError:
                    continue
    text = "\n".join(chunks)
    return _normalize(text), _normalize(_join_split_literals(text))


def _repo_literals():
    for root, _, files in os.walk(REPO_SRC):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path, encoding="utf-8") as fh:
                source = fh.read()
            try:
                tree = ast.parse(source)
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, ast.Constant) and \
                        isinstance(node.value, str):
                    yield path, node.lineno, node.value
                elif isinstance(node, ast.JoinedStr):
                    # An f-string -- which is also what an implicit
                    # '"..." f"..."' concatenation parses to, so its
                    # constant text must be checked as the joined runs
                    # the reader sees, not as sub-10-word fragments.
                    # Runs break at formatted values (the reference
                    # text has a literal "{...}" there instead).
                    run = []
                    for part in node.values:
                        if isinstance(part, ast.Constant) and \
                                isinstance(part.value, str):
                            run.append(part.value)
                        elif run:
                            yield path, node.lineno, "".join(run)
                            run = []
                    if run:
                        yield path, node.lineno, "".join(run)


def main():
    if not os.path.isdir(REFERENCE):
        print("reference tree not present; nothing to check")
        return 0
    corpora = _reference_corpora()
    failures = []
    for path, lineno, literal in _repo_literals():
        norm = _normalize(literal)
        if len(norm.split()) < MIN_WORDS:
            continue
        # Check the literal and each of its sentences, so a long
        # docstring that embeds one copied sentence still trips.
        pieces = [norm] + [s.strip() for s in
                           re.split(r"[.!?]", norm) if s.strip()]
        for piece in pieces:
            if len(piece.split()) >= MIN_WORDS and \
                    any(piece in corpus for corpus in corpora):
                failures.append((path, lineno, piece[:100]))
                break
    if failures:
        print(f"{len(failures)} literal(s) shared with the reference:")
        for path, lineno, piece in failures:
            print(f"  {path}:{lineno}: {piece!r}...")
        return 1
    print("clean: no string literal of "
          f">={MIN_WORDS} words is shared with the reference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
