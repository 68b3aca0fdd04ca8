"""Property tests for the generations-marker crash protocol (hypothesis).

The marker file is the crash-recovery source of truth for orphan-id
detection (`streaming/incremental.py`): each update appends one
``token\\tlo\\thi`` line BEFORE its postings land. A crash mid-append can
tear the FINAL line (no trailing newline, possibly truncated mid-field).
Invariants, in every state a sequence of appends and crashes can produce:

- ``_marker_max_id`` reads the max hi of the complete lines, tolerating a
  torn final line. A torn line that happens to still parse (the crash hit
  between the digits and the newline) MAY count — its postings never
  landed, so honoring its range only over-tombstones a no-op range and
  resumes ids above it: safe by the protocol's own argument.
- ``_heal_marker_tail`` truncates a torn tail (and nothing else) so the
  next 'a'-mode append can never concatenate onto the fragment; it is
  idempotent, and after it the file parses cleanly forever.
"""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from admarus_spark.streaming.incremental import _heal_marker_tail, _marker_max_id

# an "event" is a complete append (token, lo, hi), optionally torn to a
# byte-prefix by a crash mid-write
_append = st.tuples(
    st.text(alphabet="abcdefgh-0123456789", min_size=1, max_size=12),
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=10**9),
)
_events = st.lists(
    st.tuples(_append, st.one_of(st.none(), st.integers(min_value=0, max_value=30))),
    min_size=0,
    max_size=12,
)


def _torn_hi(fragment: str) -> int | None:
    """hi of a torn final line IF it still parses (3 fields, int last)."""
    parts = fragment.rstrip("\n").split("\t")
    if len(parts) == 3:
        try:
            return int(parts[2])
        except ValueError:
            return None
    return None


@settings(max_examples=200, deadline=None)
@given(_events)
def test_marker_heal_and_max_id_survive_any_crash_sequence(tmp_path_factory, events):
    d = tmp_path_factory.mktemp("marker")
    path = os.path.join(str(d), "generations")

    complete_max = -1
    torn: str | None = None  # the current torn tail fragment, if any
    for (token, lo, hi), tear in events:
        # update() heals before every append — the torn fragment (whose
        # postings never landed) is dropped
        _heal_marker_tail(path)
        torn = None
        line = f"{token}\t{lo}\t{hi}\n"
        data = line if tear is None else line[:tear]
        with open(path, "a") as f:
            f.write(data)
        if data.endswith("\n"):
            complete_max = max(complete_max, hi)
        elif data:
            torn = data

        # readable in EVERY intermediate state: complete lines are never
        # lost; a torn final line is tolerated (counted only if it still
        # parses — safe, its postings never landed)
        expect = complete_max
        if torn is not None and (th := _torn_hi(torn)) is not None:
            expect = max(expect, th)
        assert _marker_max_id(path) == expect

    # healing is idempotent and leaves a file every future append keeps
    # parseable (the exact failure mode the heal exists for: 'a'-mode
    # concatenating a new line onto a torn fragment)
    _heal_marker_tail(path)
    _heal_marker_tail(path)
    assert _marker_max_id(path) == complete_max
    with open(path, "a") as f:
        f.write("final\t0\t2000000000\n")
    assert _marker_max_id(path) == 2_000_000_000
    with open(path) as f:
        for ln in f.read().splitlines():
            parts = ln.split("\t")
            assert len(parts) == 3 and parts[2].isdigit(), ln


def test_mid_file_corruption_fails_loudly(tmp_path):
    """A malformed NON-final line is real corruption (it cannot be a torn
    append — appends only ever tear the tail): never silently under-count
    orphan ids."""
    import pytest

    path = str(tmp_path / "generations")
    with open(path, "w") as f:
        f.write("ok\t0\t4\nGARBAGE-NO-TABS\nok2\t5\t9\n")
    with pytest.raises(ValueError, match="corrupt generations marker"):
        _marker_max_id(path)


def test_heal_preserves_complete_lines_bytewise(tmp_path):
    path = str(tmp_path / "generations")
    body = "a\t0\t4\nb\t5\t9\n"
    with open(path, "w") as f:
        f.write(body + "torn\t10")
    _heal_marker_tail(path)
    with open(path) as f:
        assert f.read() == body
    _heal_marker_tail(path)  # idempotent on a clean file
    with open(path) as f:
        assert f.read() == body
