"""The reference's streaming-query / cursor scenarios, ported 1:1.

Source: `/root/reference/tests/streaming_query_test.rs` — `query_paginated`
page metadata, `QueryCursor` iteration/reset/position, `StreamQuery`
batch iteration + progress, and cursor-vs-stream consistency. Our
`PageResult.page` is 1-based (divergence documented on the class); the
reference's is 0-based, so page-number asserts are shifted by one.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.query import PageResult, QueryCursor
from rs_graphdb_spark.session import local_df
from rs_graphdb_spark.sources.export import stream_results


@pytest.fixture(scope="module")
def nodes250(spark):
    return local_df(spark, [(i, f"Node{i}") for i in range(250)],
                    "id long, name string")


def _paginated(df, page, size):
    """query_paginated analog (`src/cypher/streaming.rs:226-293`):
    independent offset/limit pages over a sorted frame."""
    total = df.count()
    rows = df.orderBy("id").offset(page * size).limit(size).collect()
    return PageResult(data=rows, page=page + 1, page_size=size, total=total,
                      has_more=page * size + len(rows) < total)


def test_basic_pagination(nodes250):
    """streaming_query_test.rs:22-56."""
    p1 = _paginated(nodes250, 0, 100)
    assert (len(p1.data), p1.total, p1.has_more) == (100, 250, True)
    assert p1.is_first_page() and not p1.is_last_page()
    p2 = _paginated(nodes250, 1, 100)
    assert len(p2.data) == 100 and p2.has_more
    assert not p2.is_first_page() and not p2.is_last_page()
    p3 = _paginated(nodes250, 2, 100)
    assert len(p3.data) == 50 and not p3.has_more and p3.is_last_page()
    p4 = _paginated(nodes250, 3, 100)
    assert len(p4.data) == 0 and not p4.has_more


def test_pagination_with_small_page_size(spark):
    """streaming_query_test.rs:58-73: 25 rows / 10 per page → 3 pages."""
    df = local_df(spark, [(i, f"N{i}") for i in range(25)],
                  "id long, name string")
    p1 = _paginated(df, 0, 10)
    assert len(p1.data) == 10 and p1.total_pages() == 3
    p3 = _paginated(df, 2, 10)
    assert len(p3.data) == 5 and not p3.has_more


def test_pagination_empty_database(spark):
    """streaming_query_test.rs:75-86."""
    df = local_df(spark, [], "id long, name string")
    p = _paginated(df, 0, 100)
    assert p.total == 0 and p.total_pages() == 0 and not p.has_more
    assert p.is_first_page() and p.is_last_page()


def test_cursor_iteration(nodes250):
    """streaming_query_test.rs:88-111: 100+100+50 then None."""
    cur = QueryCursor(nodes250, ["id"], page_size=100)
    try:
        assert len(cur.next_page().data) == 100 and cur.has_more()
        assert len(cur.next_page().data) == 100 and cur.has_more()
        assert len(cur.next_page().data) == 50 and not cur.has_more()
        assert cur.next_page() is None
    finally:
        cur.close()


def test_cursor_reset(nodes250):
    """streaming_query_test.rs:113-130: reset rewinds position to 0 and
    replays the first page."""
    cur = QueryCursor(nodes250, ["id"], page_size=100)
    try:
        cur.next_page()
        cur.next_page()
        assert cur.position() == 200
        cur.reset()
        assert cur.position() == 0
        page = cur.next_page()
        assert len(page.data) == 100 and page.page == 1
        assert [r["id"] for r in page.data] == list(range(100))
    finally:
        cur.close()


def test_stream_query_as_iterator(nodes250):
    """streaming_query_test.rs:132-167: 250 rows / batch 100 → 3 batch
    markers; every row delivered."""
    rows, markers = [], []
    for kind, item in stream_results(nodes250.orderBy("id"), batch_size=100):
        (rows if kind == "row" else markers).append(item)
    assert len(rows) == 250
    assert [m["rows"] for m in markers] == [100, 100, 50]
    assert markers[-1]["progress"] == 1.0


def test_stream_query_single_batch(spark):
    """streaming_query_test.rs:169-184: 50 rows / batch 100 → one final
    batch at progress 1.0."""
    df = local_df(spark, [(i,) for i in range(50)], "id long")
    markers = [m for k, m in stream_results(df, batch_size=100) if k == "batch_end"]
    assert len(markers) == 1 and markers[0]["rows"] == 50
    assert markers[0]["progress"] == 1.0


def test_stream_query_empty_database(spark):
    """streaming_query_test.rs:186-198: an empty source yields one
    terminal marker at progress 1.0 and no rows."""
    df = local_df(spark, [], "id long")
    items = list(stream_results(df, batch_size=100))
    assert items == [("batch_end", {"batch_index": 0, "progress": 1.0, "rows": 0})]


def test_stream_query_progress_tracking(spark):
    """streaming_query_test.rs:200-208: monotone non-decreasing progress
    ending exactly at 1.0, never overshooting."""
    df = local_df(spark, [(i,) for i in range(1000)], "id long")
    progress = [m["progress"] for k, m in stream_results(df, batch_size=100)
                if k == "batch_end"]
    assert progress == sorted(progress)
    assert progress[-1] == 1.0 and all(p <= 1.0 for p in progress)


def test_page_result_consistency(nodes250):
    """streaming_query_test.rs:210-236: walking pages until has_more is
    False covers all rows in 3 pages."""
    seen, page = [], 0
    while True:
        r = _paginated(nodes250, page, 100)
        if not r.data:
            break
        seen.extend(x["id"] for x in r.data)
        if not r.has_more:
            break
        page += 1
    assert len(seen) == 250 and page == 2


def test_pagination_with_different_sizes(spark):
    """streaming_query_test.rs:237-255: every page size partitions the
    100 rows exactly."""
    df = local_df(spark, [(i,) for i in range(100)], "id long")
    for size in (1, 10, 25, 33, 50, 100):
        pages = (100 + size - 1) // size
        total = sum(len(_paginated(df, p, size).data) for p in range(pages))
        assert total == 100, f"size {size}"


def test_cursor_vs_stream_consistency(spark):
    """streaming_query_test.rs:302-328: cursor pages and stream batches
    deliver the same ids in the same order."""
    df = local_df(spark, [(i,) for i in range(500)], "id long")
    cur = QueryCursor(df, ["id"], page_size=100)
    try:
        cursor_ids = []
        while (page := cur.next_page()) is not None:
            cursor_ids.extend(r["id"] for r in page.data)
    finally:
        cur.close()
    stream_ids = [r["id"] for k, r in
                  stream_results(df.orderBy("id"), batch_size=100) if k == "row"]
    assert cursor_ids == stream_ids == list(range(500))
