"""Ray Data stages: callables designed for ``Dataset.map_batches``.

Stateless transforms are plain functions over ``pyarrow.Table`` batches;
stateful ones are classes (actor pools) with setup in ``__init__``.
"""
