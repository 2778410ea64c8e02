from iresearch_spark.index.codec import (  # noqa: F401
    varint_decode,
    varint_encode,
    pack_doc_block,
    unpack_doc_block,
)
