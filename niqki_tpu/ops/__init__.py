from .u32pair import (
    mul64_u32, revhash64_u32, unrevhash64_u32, clz32, umulhi32,
)
from .sketch import sketch_codes, make_sketcher, padded_size
from .count import match_counts, match_counts_blocked
