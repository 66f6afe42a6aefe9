from .hamming import (  # noqa: F401
    bipolar,
    hamming_matrix,
    hamming_matrix_packed,
    hamming_pairwise,
    unpack_bits,
)
