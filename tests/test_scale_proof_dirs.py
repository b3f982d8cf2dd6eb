"""Unit tests for contrib/scale_proof_docs._measurement_dirs (round-7
ADVICE): the sweep's dir list must de-duplicate by resolved path and
refuse distinct dirs whose basename labels collide — a silent overwrite
in the output dict would make one scale's numbers vanish."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest


def _mod():
    spec = importlib.util.spec_from_file_location(
        "scale_proof_docs_under_test",
        Path(__file__).resolve().parent.parent / "contrib" / "scale_proof_docs.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_proof_docs_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_duplicate_path_measured_once(tmp_path):
    m = _mod()
    a = tmp_path / "sf1"
    a.mkdir()
    # same dir listed twice (e.g. DST repeated in SCALE_COMPARE_DIRS),
    # once with a trailing slash and once through a symlink
    link = tmp_path / "alias"
    link.symlink_to(a)
    dirs = m._measurement_dirs([str(a), f"{a}/", str(link)])
    assert dirs == [(str(a), "sf1")]


def test_distinct_dirs_sharing_label_refused(tmp_path):
    m = _mod()
    a = tmp_path / "x" / "sf1"
    b = tmp_path / "y" / "sf1"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    with pytest.raises(SystemExit, match="share the label 'sf1'"):
        m._measurement_dirs([str(a), str(b)])


def test_normal_three_scale_list_passes(tmp_path):
    m = _mod()
    names = ["sf0.1", "sf1", "sf10"]
    for n in names:
        (tmp_path / n).mkdir()
    dirs = m._measurement_dirs([str(tmp_path / n) for n in names])
    assert [label for _, label in dirs] == names
