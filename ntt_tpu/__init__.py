"""ntt_tpu — a TPU-native NTT framework for ZKP-scale polynomial transforms.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference CUDA codebase ``tie-pilot-qxw/NTT`` (see SURVEY.md): forward /
inverse / coset NTT and LDE over small Proth primes and 256-bit scalar
fields (BN254 Fr, BLS12-381 Fr), with a CGBN-equivalent planned-limb
Montgomery arithmetic layer and a four-step/SSIP flagship transform that
scales to device meshes via one all-to-all (``ntt_tpu.parallel``).
"""

from .fields import (BLS12_381_FR, BN254_FR, FIELDS, GOLDILOCKS, SMALL,
                     Field, get_field)
from . import bigint
from .limbs import from_ints, to_ints, to_mont, from_mont
from .api import coset_intt, coset_ntt, intt, lde, ntt, polymul

__version__ = "0.1.0"

__all__ = [
    "Field", "get_field", "FIELDS",
    "SMALL", "BN254_FR", "BLS12_381_FR", "GOLDILOCKS",
    "from_ints", "to_ints", "to_mont", "from_mont",
    "ntt", "intt", "coset_ntt", "coset_intt", "lde", "polymul",
]
