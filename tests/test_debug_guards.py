"""Debug/profiling knobs must refuse to run without HMSR_DEBUG_TRUNC=1.

All four knobs (tpu.rob_trunc, tpu.align_levels, HMSR_MERGE_DIAG,
HMSR_ICA_DIAG) silently corrupt output when active; a stray env var or
config key from a profiling session must fail loudly, not poison
production runs.
"""

import pytest


def test_merge_diag_refuses_without_gate(monkeypatch):
    from hmsr_tpu.ops import pallas_merge

    monkeypatch.setenv("HMSR_MERGE_DIAG", "noexp")
    monkeypatch.delenv("HMSR_DEBUG_TRUNC", raising=False)
    with pytest.raises(ValueError, match="HMSR_MERGE_DIAG"):
        pallas_merge._read_diag()


def test_merge_diag_allowed_with_gate(monkeypatch):
    from hmsr_tpu.ops import pallas_merge

    monkeypatch.setenv("HMSR_MERGE_DIAG", "noexp")
    monkeypatch.setenv("HMSR_DEBUG_TRUNC", "1")
    assert pallas_merge._read_diag() == "noexp"


def test_merge_diag_off_by_default(monkeypatch):
    from hmsr_tpu.ops import pallas_merge

    monkeypatch.delenv("HMSR_MERGE_DIAG", raising=False)
    assert pallas_merge._read_diag() == ""


def test_ica_diag_refuses_without_gate(monkeypatch):
    from hmsr_tpu.ops import pallas_ica

    monkeypatch.setenv("HMSR_ICA_DIAG", "zero")
    monkeypatch.delenv("HMSR_DEBUG_TRUNC", raising=False)
    with pytest.raises(ValueError, match="HMSR_ICA_DIAG"):
        pallas_ica._read_diag()


def test_ica_diag_allowed_with_gate(monkeypatch):
    from hmsr_tpu.ops import pallas_ica

    monkeypatch.setenv("HMSR_ICA_DIAG", "notap")
    monkeypatch.setenv("HMSR_DEBUG_TRUNC", "1")
    assert pallas_ica._read_diag() == "notap"


def test_ica_diag_off_by_default(monkeypatch):
    from hmsr_tpu.ops import pallas_ica

    monkeypatch.delenv("HMSR_ICA_DIAG", raising=False)
    assert pallas_ica._read_diag() == ""
