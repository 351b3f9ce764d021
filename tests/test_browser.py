"""BrowserFetchStage — the Selenium middleware analogue
(reference middlewares/selenium.py:14-46): lazy singleton driver,
body-wait timeout, drop-on-error, page_source output."""

import math

import pyarrow as pa
import pytest

from blockchainspider_ray.stages.browser import (
    RENDER_MARKER,
    BrowserFetchStage,
)


def _batch(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "html": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_stub_raises_at_first_use_not_construction():
    stage = BrowserFetchStage()  # construction is free (lazy driver)
    with pytest.raises(NotImplementedError):
        stage(_batch([(1, "<html><body>x</body></html>")]))


def test_lazy_singleton_driver_created_once():
    stage = BrowserFetchStage(renderer="fake", timeout=100, render_rate=10)
    assert stage.driver_inits == 0  # reference :23 — created on first request
    stage(_batch([(1, "<html><body>a</body></html>")]))
    stage(_batch([(2, "<html><body>b</body></html>")]))
    assert stage.driver_inits == 1
    assert stage._driver.gets == 2


def test_render_appends_marker_and_status_200():
    stage = BrowserFetchStage(renderer="fake", timeout=100, render_rate=10)
    html = "<html><body>hello</body></html>"
    out = stage(_batch([(7, html)]))
    assert out.column("page_source").to_pylist() == [html + RENDER_MARKER]
    assert out.column("status").to_pylist() == [200]
    assert out.column("doc_id").to_pylist() == [7]
    assert "html" not in out.column_names  # payload dropped immediately


def test_timeout_drops_slow_pages_keeps_fast_ones():
    # render_rate=1 char/s, timeout=30s -> pages > 30 chars never finish
    stage = BrowserFetchStage(renderer="fake", timeout=30, render_rate=1)
    fast = "<body>ok</body>"  # 15 chars
    slow = "<html><head></head><body>" + "x" * 40 + "</body></html>"
    out = stage(_batch([(1, fast), (2, slow), (3, fast)]))
    assert out.column("doc_id").to_pylist() == [1, 3]
    assert stage.dropped == 1  # IgnoreRequest analogue, reference :42-44
    assert stage.max_render_chars == 30


def test_bodyless_page_times_out_like_webdriverwait():
    # no <body> element: WebDriverWait can never see it (reference :32-34)
    stage = BrowserFetchStage(renderer="fake", timeout=1000, render_rate=1000)
    out = stage(_batch([(1, "<html><head>no body here</head></html>")]))
    assert out.num_rows == 0
    assert stage.dropped == 1


def test_poll_accounting_matches_waits():
    # 20-char body page at 1 char/s = 20s ready; poll=0.5 -> 40 polls
    stage = BrowserFetchStage(renderer="fake", timeout=60, render_rate=1, poll=0.5)
    html = "<body>" + "x" * 7 + "</body>"  # exactly 20 chars
    assert len(html) == 20
    stage(_batch([(1, html)]))
    assert stage.polls == math.ceil(20 / 0.5)


def test_binary_html_accepted():
    stage = BrowserFetchStage(renderer="fake", timeout=100, render_rate=10)
    b = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "html": pa.array([b"<html><body>bin</body></html>"], pa.binary()),
        }
    )
    out = stage(b)
    assert out.column("page_source").to_pylist() == [
        "<html><body>bin</body></html>" + RENDER_MARKER
    ]
