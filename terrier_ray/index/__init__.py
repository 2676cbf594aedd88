"""Inverted-index build + BM25 retrieval (the CREATE INDEX / IndexScan analog).

Reference analogs (SURVEY.md §2/§7):
- parallel index build: /root/reference/src/execution/compiler/operator/index_create_translator.cpp:121-135
- partitioned aggregation shuffle: /root/reference/src/execution/sql/aggregation_hash_table.cpp:647-769
- parallel top-k: /root/reference/src/execution/sql/sorter.cpp:424-430
"""

from terrier_ray.index.codec import (  # noqa: F401
    varbyte_encode,
    varbyte_decode,
    delta_encode,
    delta_decode,
    ef_encode,
    ef_decode,
    encode_posting_list,
    decode_posting_list,
)
