"""End-user pipelines: the driver-facing query suite and crawl runs."""
