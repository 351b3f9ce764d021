"""The crawl round engine: frontier → politeness → fetch → parse → rank."""
