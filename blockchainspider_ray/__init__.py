"""blockchainspider_ray — a Ray-Data-native web-crawl / frontier-scheduling engine.

A from-scratch reimplementation of the data-processing capabilities of
wuzhy1ng/BlockchainSpider (reference at /root/reference) on top of
``ray.data.Dataset`` pipelines:

- the "web" is a Parquet table of Common-Crawl-style pages
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string);
- fetch = partition-pruned lookup join of the frontier against that table;
- parse = zero-copy Arrow ``map_batches`` stages (text extraction is
  byte-identical to the reference's 3-regex pipeline,
  reference spiders/labels/web.py:47-50);
- frontier ranking reproduces the reference's PushPop strategies
  (BFS / Poison / Haircut / APPR / TTR*, reference strategies/txs/*.py);
- URL-seen set = sharded cuckoo-filter actor pool;
- politeness = per-host round budgets with carry-over.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (bench.py, pytest fixture, or the driver).
"""

__version__ = "0.1.0"
