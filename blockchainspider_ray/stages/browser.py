"""Browser-rendered fetch stage — the Selenium middleware analogue.

Reference: BlockchainSpider/middlewares/selenium.py:14-46 —
``SeleniumMiddleware`` holds ONE lazily-created webdriver per process,
serializes every ``process_request`` behind an ``asyncio.Lock``, sleeps
``DOWNLOAD_DELAY`` after ``driver.get``, waits for a ``<body>`` element
(``WebDriverWait(timeout, poll=0.5)``), returns the encoded
``page_source`` as a 200 response, and silently drops the request
(``IgnoreRequest``) on any error.

Ray-Data-first mapping:

- the lock-serialized singleton driver == an actor-pool ``map_batches``
  stage with ``concurrency=1`` (or ``concurrency=N`` for N independent
  browsers — the reference's one-process-one-driver scaled out);
- lazy driver construction == first-``__call__`` init (NOT ``__init__``,
  matching the reference, so a never-used stage never pays browser spawn);
- body-wait timeout == a per-page render budget; pages whose body never
  appears inside ``timeout`` are dropped from the output batch, exactly
  the ``IgnoreRequest`` semantics (the row vanishes, the pipeline goes on);
- page_source == rendered html appended with a render marker.

A real webdriver is not available in this container, so the renderer is
pluggable the same way the image codecs are (stages/multimodal.py):

- ``renderer='stub'`` raises NotImplementedError at first use — the
  honest production marker (swap in a selenium/playwright driver there);
- ``renderer='fake'`` is a deterministic simulator: render time is
  ``len(html) / render_rate`` simulated seconds, the body-wait polls at
  ``poll`` intervals up to ``timeout``, and the rendered page_source is
  ``html + RENDER_MARKER``.  No wall-clock sleeping — the clock is
  simulated, so tests and the DuckDB oracle are exact.
"""

from __future__ import annotations

import math

import pyarrow as pa

RENDER_MARKER = "<!-- rendered -->"


class _FakeBrowser:
    """Deterministic stand-in for webdriver.Chrome. Renders html strings;
    'render time' is byte-proportional so timeout semantics are testable."""

    def __init__(self, render_rate: float):
        self.render_rate = float(render_rate)
        self.gets = 0

    def render(self, html: str) -> float:
        """Returns the simulated seconds until <body> is present, or inf
        if the page has no body element at all (the WebDriverWait can
        never succeed, reference selenium.py:32-34)."""
        self.gets += 1
        if "<body" not in html:
            return math.inf
        return len(html) / self.render_rate


class BrowserFetchStage:
    """html -> browser-rendered page_source, as an actor-pool batch stage.

    Input batch: any key columns + an ``html`` (string) column.
    Output batch: the key columns + ``page_source`` (string) +
    ``status`` (int32, always 200 — failures are dropped, not errored).

    Pass the CLASS to ``map_batches(BrowserFetchStage, fn_constructor_kwargs=...,
    concurrency=1, batch_size<=64)`` for the reference's serialized-singleton
    regime; an INSTANCE works as stateless Ray tasks for small jobs.
    """

    def __init__(
        self,
        renderer: str = "stub",
        timeout: float = 60.0,
        delay: float = 1.0,
        poll: float = 0.5,
        render_rate: float = 64.0,
    ):
        self.renderer = renderer
        self.timeout = float(timeout)   # reference DOWNLOAD_TIMEOUT
        self.delay = float(delay)       # reference DOWNLOAD_DELAY
        self.poll = float(poll)         # reference WebDriverWait poll=0.5
        self.render_rate = float(render_rate)
        self._driver = None             # lazy singleton (reference :23-27)
        self.driver_inits = 0
        self.dropped = 0                # IgnoreRequest analogue count
        self.polls = 0                  # simulated WebDriverWait polls

    def _ensure_driver(self):
        if self._driver is None:
            if self.renderer == "stub":
                raise NotImplementedError(
                    "no webdriver in this environment; plug a real browser "
                    "here or use renderer='fake' for the deterministic "
                    "simulator"
                )
            self._driver = _FakeBrowser(self.render_rate)
            self.driver_inits += 1
        return self._driver

    @property
    def max_render_chars(self) -> int:
        """Largest html (chars) whose body appears within the timeout —
        the deterministic drop threshold the SQL oracle mirrors."""
        return int(self.timeout * self.render_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        driver = self._ensure_driver()
        keep_idx, sources = [], []
        htmls = batch.column("html").to_pylist()
        for i, html in enumerate(htmls):
            h = html if isinstance(html, str) else bytes(html).decode("utf-8")
            ready_at = driver.render(h)
            # simulated WebDriverWait(timeout, poll): count polls until
            # the body shows up or the budget is gone
            waited = min(ready_at, self.timeout)
            self.polls += max(1, math.ceil(waited / self.poll)) if self.poll > 0 else 1
            if ready_at > self.timeout:
                self.dropped += 1  # IgnoreRequest: row vanishes
                continue
            keep_idx.append(i)
            sources.append(h + RENDER_MARKER)
        out = batch.drop_columns(["html"]).take(pa.array(keep_idx, pa.int64()))
        return out.append_column(
            "page_source", pa.array(sources, pa.string())
        ).append_column("status", pa.array([200] * len(sources), pa.int32()))
