"""Block weight-only quantization: QTensor formats + fused Pallas kernels."""

from ggml_experiments_tpu.quant.qtensor import (
    BLOCK,
    QTensor,
    dequantize,
    from_numpy_blocks,
    quantization_error,
    quantize,
    QTYPES,
    QTYPE_BITS,
    QTYPE_TOTAL_BITS,
    to_numpy_blocks,
    unpack_hibits,
    unpack_nibbles,
    unpack_q4,
)
from ggml_experiments_tpu.quant.pallas_kernels import (
    qmatmul,
    qmatmul_reference,
    set_interpret,
)

__all__ = [
    "BLOCK",
    "QTensor",
    "dequantize",
    "from_numpy_blocks",
    "quantization_error",
    "quantize",
    "QTYPES",
    "QTYPE_BITS",
    "QTYPE_TOTAL_BITS",
    "to_numpy_blocks",
    "unpack_hibits",
    "unpack_nibbles",
    "unpack_q4",
    "qmatmul",
    "qmatmul_reference",
    "set_interpret",
]
