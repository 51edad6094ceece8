"""paddleocr_spark — a from-scratch PySpark-native re-expression of the
hoonisone/PaddleOCR extraction semantics (SURVEY.md is the blueprint).

Not a port: the reference's per-image C++/Paddle dataflow becomes declarative
DataFrame stages + Arrow-vectorized grouped kernels; Catalyst is the
optimizer (SURVEY.md §4).
"""

__version__ = "0.1.0"
