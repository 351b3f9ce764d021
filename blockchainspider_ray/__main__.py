import os

# Small-frame polars ops on the crawl driver pay 4-7x fork/join overhead
# with the default one-thread-per-core pool; Ray worker tasks hold 1 CPU
# each and shouldn't fan out either.  Must precede the first polars import.
os.environ.setdefault("POLARS_MAX_THREADS", "8")

from .cli import main  # noqa: E402

raise SystemExit(main())
