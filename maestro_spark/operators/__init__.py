"""Distributed operators: doc-id assignment, index build (tokenize →
postings → salted encode → segment merge), BM25 top-k search, dedup,
similarity search, text analysis."""
