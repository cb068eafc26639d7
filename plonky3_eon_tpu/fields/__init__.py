"""Field layer (reference parity: `field/`, `bn254/` — SURVEY.md §2.1)."""

from .field import Field, Ring, mulhi32
from .monty31 import BabyBear, KoalaBear, MontyField31
from .mersenne31 import Mersenne31, Mersenne31Field
from .goldilocks import Goldilocks, GoldilocksField
from .bigfield import BigPrimeField, Bn254Fr, Bn254Fp
from .extension import (
    BabyBear4,
    BabyBear5,
    BinomialExtension,
    KoalaBear4,
    KoalaBear8,
    Mersenne31Complex,
    Mersenne31Cubic,
    Mersenne31Quartic,
)
from . import serial

__all__ = [
    "serial",
    "Field",
    "Ring",
    "mulhi32",
    "MontyField31",
    "BabyBear",
    "KoalaBear",
    "Mersenne31",
    "Mersenne31Field",
    "BinomialExtension",
    "BabyBear4",
    "BabyBear5",
    "KoalaBear4",
    "KoalaBear8",
    "Mersenne31Cubic",
    "Mersenne31Complex",
    "Mersenne31Quartic",
]
