"""Data runtime: batch streams, prefetch, loaders, tokenizer, text utils."""

from .batchstream import (
    BatchStream,
    from_full_batch,
    from_function,
    from_indices,
    minibatches_from_full,
    prefetch_to_device,
    staged_from_indices,
)
from .hf_tokenizer import HFTokenizer
from .tokenizer import (
    ByteSegmentCodec,
    Codec,
    IdentityCodec,
    bpe_decode,
    bpe_encode,
    train_bpe,
)
from .text import (
    chars_to_integers,
    minibatches_from_text,
    sequence_prediction,
    sequence_prediction_beam,
    words_to_integers,
)
from .lm_data import (
    autoregressive_inference,
    autoregressive_minibatches_from_corpus,
    pack_documents,
)
from .bert_data import BertBatch, make_mlm_mask, prepare_sentence_pairs
from .graph_data import pack_graphs, small_graph_stream
from .readers import categorical_to_int, read_csv, read_npy, write_npy
from .images import (
    denormalize_image,
    image_to_tensor,
    normalize_image,
    tensor_to_image,
)

__all__ = [
    "HFTokenizer",
    "BatchStream",
    "from_full_batch",
    "from_function",
    "from_indices",
    "minibatches_from_full",
    "prefetch_to_device",
    "staged_from_indices",
    "train_bpe",
    "bpe_encode",
    "bpe_decode",
    "ByteSegmentCodec",
    "IdentityCodec",
    "Codec",
    "chars_to_integers",
    "words_to_integers",
    "minibatches_from_text",
    "sequence_prediction",
    "sequence_prediction_beam",
    "autoregressive_minibatches_from_corpus",
    "autoregressive_inference",
    "pack_documents",
    "make_mlm_mask",
    "prepare_sentence_pairs",
    "BertBatch",
    "pack_graphs",
    "small_graph_stream",
    "read_csv",
    "read_npy",
    "write_npy",
    "categorical_to_int",
    "image_to_tensor",
    "tensor_to_image",
    "normalize_image",
    "denormalize_image",
]
