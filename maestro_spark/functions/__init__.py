"""Pure, vectorized scalar/array functions: BM25 math, posting codec,
code-aware tokenization, text-analysis heuristics. No Spark imports here —
these run inside Arrow UDFs on executors and inside the pytest oracle."""
