"""DataFrame-level operators of the engine.

Each module composes built-in pyspark.sql functions first; Arrow
(pandas) UDF kernels appear only where relational ops genuinely cannot
express the semantics (signal featurization, xcorr kernels, codec
packing, greedy dominant-frequency dedup).
"""
