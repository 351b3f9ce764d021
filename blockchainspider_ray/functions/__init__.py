"""Pure, vectorizable scalar/batch functions (no Ray dependency).

Everything here is deterministic and safe to call inside
``Dataset.map_batches`` workers.
"""
