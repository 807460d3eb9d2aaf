"""Live-source tail (S1): cursor pagination, retry/backoff, crash-resume,
and the full source → changelog → MERGE → oracle path."""

from __future__ import annotations

import pytest

from bear_spark import oracle
from bear_spark.events import change_events
from bear_spark.lake import LakeTable
from bear_spark.schema import CHANGE_EVENT_SCHEMA, KEY_COLS, TRANSCRIPT_SCHEMA
from bear_spark.sources.live import (
    LiveTail,
    TailState,
    TransientSourceError,
    paginate,
    with_retry,
)
from bear_spark.streaming import CDCApplier

N = 5000


@pytest.fixture(scope="module")
def event_records(spark):
    ev = change_events(spark, N, n_convs=40, seed=77)
    pdf = ev.toPandas()
    return pdf, [r._asdict() for r in pdf.itertuples(index=False)]


def flaky(fetch, fail_every=3, fails_per_hit=2):
    """Raise `fails_per_hit` transient errors on every `fail_every`-th
    distinct fetch before letting it through."""
    seen: dict[str | None, int] = {}
    calls = [0]

    def wrapped(cursor):
        calls[0] += 1
        if calls[0] % fail_every == 0:
            n = seen.get(cursor, 0)
            if n < fails_per_hit:
                seen[cursor] = n + 1
                raise TransientSourceError(f"injected failure #{n + 1} at {cursor}")
        return fetch(cursor)

    return wrapped


def test_retry_backoff_then_give_up():
    naps: list[float] = []

    def always_down(cursor):
        raise TransientSourceError("down")

    f = with_retry(always_down, attempts=4, base_wait=1.0, sleep=naps.append)
    with pytest.raises(TransientSourceError):
        f(None)
    assert naps == [1.0, 2.0, 4.0]  # exponential, attempts-1 waits


def test_tail_spills_chunks_through_failures(tmp_path, event_records):
    pdf, records = event_records
    naps: list[float] = []
    tail = LiveTail(
        flaky(paginate(records, page_size=250)),
        str(tmp_path / "log"),
        chunk_records=1000,
        sleep=naps.append,
        schema=CHANGE_EVENT_SCHEMA,
    )
    written = tail.run()
    assert len(written) == N // 1000
    assert naps, "injected failures must have triggered backoff waits"
    import pandas as pd

    got = pd.concat([pd.read_parquet(p) for p in written])
    assert len(got) == N
    assert sorted(got["lsn"]) == sorted(pdf["lsn"])
    st = TailState.load(str(tmp_path / "log"))
    assert st.exhausted and st.seq == len(written)
    # an exhausted tail is a no-op on rerun
    assert tail.run() == []


def test_tail_crash_and_resume(tmp_path, event_records):
    """Kill the tail mid-crawl (non-transient explosion), resume: the
    union of both runs is the complete log, no record lost, chunk seqs
    contiguous."""
    pdf, records = event_records
    fetch = paginate(records, page_size=500)
    boom = [8]  # crash on the 8th fetch

    def crashing(cursor):
        boom[0] -= 1
        if boom[0] == 0:
            raise RuntimeError("process died")
        return fetch(cursor)

    out = str(tmp_path / "log")
    tail1 = LiveTail(crashing, out, chunk_records=1000, schema=CHANGE_EVENT_SCHEMA)
    with pytest.raises(RuntimeError, match="process died"):
        tail1.run()
    st = TailState.load(out)
    assert 0 < st.seq < N // 1000 and not st.exhausted

    tail2 = LiveTail(fetch, out, chunk_records=1000, schema=CHANGE_EVENT_SCHEMA)
    more = tail2.run()
    assert more, "resume must fetch the unspilled suffix"
    import pandas as pd

    import glob
    import os

    files = sorted(glob.glob(os.path.join(out, "chunk_*.parquet")))
    got = pd.concat([pd.read_parquet(p) for p in files])
    assert sorted(got["lsn"]) == sorted(pdf["lsn"])  # exactly once, in full


def test_live_source_to_table_matches_oracle(spark, tmp_path, event_records):
    """The whole S1→S6 path: flaky paginated source → LiveTail chunks →
    streaming CDCApplier → LakeTable == replay oracle."""
    pdf, records = event_records
    out = str(tmp_path / "log")
    LiveTail(
        flaky(paginate(records, page_size=333)),
        out,
        chunk_records=1000,
        sleep=lambda s: None,
        schema=CHANGE_EVENT_SCHEMA,
    ).run()
    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, key_cols=KEY_COLS, num_buckets=4
    )
    CDCApplier(
        spark, table, out, str(tmp_path / "ckpt"), str(tmp_path / "metrics"),
        max_files_per_trigger=2,
    ).run_available()
    oracle.assert_states_equal(table.read().toPandas(), oracle.replay(pdf))
