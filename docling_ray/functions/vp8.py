"""VP8 (RFC 6386) normative constants and reconstruction primitives.

Like ``pdfcrypt.py``/``colorspace.py``, this is the narrow band the
synthetic generator (encoder side, synth.py) and the extractor (decoder
side, stages/webp_codec.py) are ALLOWED to share: only material fixed by
the published specification lives here — the quantizer lookup tables,
token trees and default probability tables of RFC 6386 §11/§13, and the
reconstruction math of §12 (intra prediction), §14 (inverse DCT/WHT) and
§15 (loop filter). The bitstream layers — the boolean range decoder in
webp_codec.py and the boolean range encoder in synth.py — are written
independently on each side, so a protocol bug cannot silently cancel
across the round trip; additionally tests decode REAL libwebp-encoded
frames and compare Y/U/V planes bit-exactly against ``libwebp.so``'s own
decoder when that system library is present (tests/test_vp8_parity.py).

Reference capability anchor: the reference accepts lossy WebP via PIL
(docling/backend/image_backend.py:26).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Prediction / block-mode enums (RFC 6386 §8.2, §11.2)
# ---------------------------------------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# a 16x16 mode seen as the "subblock mode" of its neighbors (§11.3)
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

# token trees (RFC 6386 §8.2: [left-child, right-child] pairs; negative =
# leaf value, positive = next node index)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC_PRED, 2, -B_TM_PRED, 4, -B_VE_PRED, 6, 8, 12,
    -B_HE_PRED, 10, -B_RD_PRED, -B_VR_PRED, -B_LD_PRED, 14,
    -B_VL_PRED, 16, -B_HD_PRED, -B_HU_PRED)
MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# coefficient-token tree (§13.2): EOB, 0, 1, 2, 3, 4, cat1..cat6
COEF_TREE = (
    -11, 2,            # DCT_EOB (encoded here as leaf 11), ...
    -0, 4,             # ZERO
    -1, 6,             # ONE
    8, 12,
    -2, 10,            # TWO
    -3, -4,            # THREE, FOUR
    14, 16,
    -5, -6,            # CAT1, CAT2
    18, 20,
    -7, -8,            # CAT3, CAT4
    -9, -10)           # CAT5, CAT6
TOKEN_EOB = 11

# extra-bit probabilities and base values for categories 1-6 (§13.2)
CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
             (180, 157, 141, 134, 130),
             (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
CAT_BASE = (5, 7, 11, 19, 35, 67)

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
)

AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# [block_type][band][ctx][token] flattened, 4*8*3*11
COEF_UPDATE_PROBS = (
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255,
    250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255,
    234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255,
    251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
)

DEFAULT_COEF_PROBS = (
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
    189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128,
    106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128,
    1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128,
    181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128,
    78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128,
    1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128,
    184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128,
    77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128,
    170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128,
    37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128,
    1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128,
    102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128,
    1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128,
    177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128,
    80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62,
    131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1,
    68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128,
    1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128,
    184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128,
    81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128,
    1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128,
    99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128,
    1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128,
    109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128,
    44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128,
    94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128,
    22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128,
    1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128,
    124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128,
    35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128,
    1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128,
    121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128,
    45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128,
    1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128,
    203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128,
    175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128,
    73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128,
    1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128,
    239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128,
    155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128,
    1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128,
    201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128,
    69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128,
    1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128,
    223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128,
    141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128,
    149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128,
    213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128,
    55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255,
    126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128,
    61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128,
    1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128,
    166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128,
    39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128,
    1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128,
    124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128,
    1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128,
    149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128,
    28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128,
    123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128,
    20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128,
    1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128,
    168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128,
    47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128,
    1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128,
    141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128,
    42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
)

# [above_bmode][left_bmode][tree_prob], 10*10*9 flattened,
# rows/cols in the RFC 6386 mode order
KF_BMODE_PROBS = (
    231, 120, 48, 89, 115, 113, 120, 152, 112,
    152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103,
    56, 58, 10, 171, 218, 189, 17, 13, 152,
    144, 71, 10, 38, 171, 213, 144, 34, 26,
    114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85,
    170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226,
    81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148,
    72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128,
    41, 53, 9, 178, 241, 141, 26, 8, 107,
    104, 79, 12, 27, 217, 255, 87, 17, 7,
    74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128,
    87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194,
    66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205,
    43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171,
    56, 34, 51, 104, 114, 102, 29, 93, 77,
    107, 54, 32, 26, 51, 1, 81, 43, 31,
    39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73,
    68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124,
    62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111,
    60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114,
    40, 42, 1, 196, 245, 209, 10, 25, 109,
    100, 80, 8, 43, 154, 1, 51, 26, 71,
    88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209,
    142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221,
    51, 50, 17, 168, 209, 192, 23, 25, 82,
    125, 98, 42, 88, 104, 85, 117, 175, 82,
    95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1,
    57, 17, 5, 71, 102, 57, 53, 41, 49,
    115, 21, 2, 10, 102, 255, 166, 23, 6,
    38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114,
    101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43,
    117, 20, 15, 36, 163, 128, 68, 1, 26,
    138, 31, 36, 171, 27, 166, 38, 44, 229,
    67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154,
    40, 40, 21, 116, 143, 209, 34, 39, 175,
    57, 46, 22, 24, 128, 1, 54, 17, 37,
    47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183,
    65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223,
    87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226,
    64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213,
    30, 34, 26, 133, 152, 116, 10, 32, 134,
    75, 32, 12, 51, 192, 255, 160, 43, 51,
    39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73,
    88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192,
    55, 38, 70, 124, 73, 102, 1, 34, 98,
    102, 61, 71, 37, 34, 53, 31, 243, 192,
    69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171,
    62, 17, 19, 70, 146, 85, 55, 62, 70,
    75, 15, 9, 9, 64, 255, 184, 119, 16,
    37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85,
    86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128,
    58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218,
    51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128,
    22, 26, 17, 131, 240, 154, 14, 1, 209,
    83, 12, 13, 54, 192, 255, 68, 47, 28,
    45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213,
    85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246,
    35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45,
    85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85,
    56, 41, 15, 176, 236, 85, 37, 9, 62,
    146, 36, 19, 30, 171, 255, 97, 27, 20,
    71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142,
    138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163,
    112, 19, 12, 61, 195, 128, 48, 4, 24,
)



# ---------------------------------------------------------------------------
# Dequantization (RFC 6386 §13.3)
# ---------------------------------------------------------------------------

def _clamp_qi(x: int) -> int:
    return 0 if x < 0 else 127 if x > 127 else x


def segment_quants(y_ac_qi: int, deltas: tuple[int, int, int, int, int],
                   seg_enabled: bool, seg_abs: bool,
                   seg_quant: list[int]) -> list[tuple[int, ...]]:
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) quantizer values.
    ``deltas`` = (y1dc, y2dc, y2ac, uvdc, uvac) index deltas from the
    frame header; segment feature data is absolute or additive per
    ``seg_abs``."""
    out = []
    for s in range(4):
        qi = y_ac_qi
        if seg_enabled:
            qi = seg_quant[s] if seg_abs else qi + seg_quant[s]
        qi = _clamp_qi(qi)
        y1dc = DC_QLOOKUP[_clamp_qi(qi + deltas[0])]
        y1ac = AC_QLOOKUP[qi]
        y2dc = DC_QLOOKUP[_clamp_qi(qi + deltas[1])] * 2
        y2ac = AC_QLOOKUP[_clamp_qi(qi + deltas[2])] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_qi(qi + deltas[3])]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_qi(qi + deltas[4])]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3-14.4) — exact integer arithmetic
# ---------------------------------------------------------------------------

def iwht4x4(levels: list[int]) -> list[int]:
    """Inverse Walsh-Hadamard on the dequantized Y2 block → the 16 DC
    coefficients of the macroblock's luma subblocks (raster order)."""
    ip = list(levels)
    op = [0] * 16
    for i in range(4):
        a1 = ip[0 + i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[0 + i] - ip[12 + i]
        op[0 + i] = a1 + b1
        op[4 + i] = c1 + d1
        op[8 + i] = a1 - b1
        op[12 + i] = d1 - c1
    ip = op
    op = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = ip[r + 0] + ip[r + 3]
        b1 = ip[r + 1] + ip[r + 2]
        c1 = ip[r + 1] - ip[r + 2]
        d1 = ip[r + 0] - ip[r + 3]
        op[r + 0] = (a1 + b1 + 3) >> 3
        op[r + 1] = (c1 + d1 + 3) >> 3
        op[r + 2] = (a1 - b1 + 3) >> 3
        op[r + 3] = (d1 - c1 + 3) >> 3
    return op


_C1 = 20091  # (cos(pi/8)*sqrt(2) - 1) << 16
_C2 = 35468  # sin(pi/8)*sqrt(2) << 16


def idct4x4(coefs: list[int]) -> np.ndarray:
    """Inverse 4x4 DCT → 4x4 int32 residual (row-major)."""
    ip = list(coefs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12.2-12.3)
# ---------------------------------------------------------------------------

def _pred_full(mode: int, above: np.ndarray, left: np.ndarray,
               top_left: int, up: bool, lf: bool, n: int) -> np.ndarray:
    """16x16 luma / 8x8 chroma whole-block prediction. ``above``/``left``
    already carry the border values (127 / 129) when the neighbor is
    outside the frame; DC special-cases availability per spec."""
    if mode == DC_PRED:
        if up and lf:
            dc = (int(above.sum()) + int(left.sum()) + n) >> \
                (5 if n == 16 else 4)
        elif up:
            dc = (int(above.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        elif lf:
            dc = (int(left.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        else:
            dc = 128
        return np.full((n, n), dc, np.int32)
    if mode == V_PRED:
        return np.repeat(above[None, :], n, axis=0).astype(np.int32)
    if mode == H_PRED:
        return np.repeat(left[:, None], n, axis=1).astype(np.int32)
    # TM_PRED
    p = left.astype(np.int32)[:, None] + above.astype(np.int32)[None, :] \
        - int(top_left)
    return np.clip(p, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def predict_b(mode: int, a: np.ndarray, left: np.ndarray,
              top_left: int) -> np.ndarray:
    """4x4 subblock prediction; ``a`` = 8 above pixels (4 above + 4
    above-right), ``left`` = 4 left pixels, all int."""
    a = a.astype(np.int64)
    left = left.astype(np.int64)
    tl = int(top_left)
    out = np.empty((4, 4), np.int64)
    if mode == B_DC_PRED:
        out[:] = (int(a[:4].sum()) + int(left.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        out[:] = np.clip(left[:, None] + a[None, :4] - tl, 0, 255)
    elif mode == B_VE_PRED:
        ext = np.concatenate(([tl], a[:5]))
        row = _avg3(ext[0:4], ext[1:5], ext[2:6])
        out[:] = row[None, :]
    elif mode == B_HE_PRED:
        ext = np.array([tl, left[0], left[1], left[2], left[3], left[3]])
        col = _avg3(ext[0:4], ext[1:5], ext[2:6])
        out[:] = col[:, None]
    elif mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r, c] = _avg3(a[i], a[i + 1], a[i + 2]) if i < 6 \
                    else (a[6] + 3 * a[7] + 2) >> 2
    elif mode in (B_RD_PRED, B_VR_PRED, B_HD_PRED):
        pp = np.array([left[3], left[2], left[1], left[0], tl,
                       a[0], a[1], a[2], a[3]], np.int64)
        if mode == B_RD_PRED:
            for r in range(4):
                for c in range(4):
                    k = c - r + 4
                    out[r, c] = _avg3(pp[k - 1], pp[k], pp[k + 1])
        elif mode == B_VR_PRED:
            # explicit assignment table per the reference code (§12.3)
            out[3, 0] = _avg3(pp[1], pp[2], pp[3])
            out[2, 0] = _avg3(pp[2], pp[3], pp[4])
            out[3, 1] = out[1, 0] = _avg3(pp[3], pp[4], pp[5])
            out[2, 1] = out[0, 0] = _avg2(pp[4], pp[5])
            out[3, 2] = out[1, 1] = _avg3(pp[4], pp[5], pp[6])
            out[2, 2] = out[0, 1] = _avg2(pp[5], pp[6])
            out[3, 3] = out[1, 2] = _avg3(pp[5], pp[6], pp[7])
            out[2, 3] = out[0, 2] = _avg2(pp[6], pp[7])
            out[1, 3] = _avg3(pp[6], pp[7], pp[8])
            out[0, 3] = _avg2(pp[7], pp[8])
        else:  # B_HD_PRED
            out[3, 0] = _avg2(pp[0], pp[1])
            out[3, 1] = _avg3(pp[0], pp[1], pp[2])
            out[2, 0] = out[3, 2] = _avg2(pp[1], pp[2])
            out[2, 1] = out[3, 3] = _avg3(pp[1], pp[2], pp[3])
            out[2, 2] = out[1, 0] = _avg2(pp[2], pp[3])
            out[2, 3] = out[1, 1] = _avg3(pp[2], pp[3], pp[4])
            out[1, 2] = out[0, 0] = _avg2(pp[3], pp[4])
            out[1, 3] = out[0, 1] = _avg3(pp[3], pp[4], pp[5])
            out[0, 2] = _avg3(pp[4], pp[5], pp[6])
            out[0, 3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == B_VL_PRED:
        out[0, 0] = _avg2(a[0], a[1])
        out[1, 0] = _avg3(a[0], a[1], a[2])
        out[2, 0] = out[0, 1] = _avg2(a[1], a[2])
        out[1, 1] = out[3, 0] = _avg3(a[1], a[2], a[3])
        out[2, 1] = out[0, 2] = _avg2(a[2], a[3])
        out[3, 1] = out[1, 2] = _avg3(a[2], a[3], a[4])
        out[0, 3] = out[2, 2] = _avg2(a[3], a[4])
        out[1, 3] = out[3, 2] = _avg3(a[3], a[4], a[5])
        out[2, 3] = _avg3(a[4], a[5], a[6])
        out[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HU_PRED:
        lp = left
        out[0, 0] = _avg2(lp[0], lp[1])
        out[0, 1] = _avg3(lp[0], lp[1], lp[2])
        out[0, 2] = out[1, 0] = _avg2(lp[1], lp[2])
        out[0, 3] = out[1, 1] = _avg3(lp[1], lp[2], lp[3])
        out[1, 2] = out[2, 0] = _avg2(lp[2], lp[3])
        out[1, 3] = out[2, 1] = (lp[2] + 3 * lp[3] + 2) >> 2
        out[2, 2] = out[2, 3] = lp[3]
        out[3, :] = lp[3]
    else:
        raise ValueError(f"bad subblock mode {mode}")
    return out


# ---------------------------------------------------------------------------
# Frame reconstruction (RFC 6386 §12-14)
# ---------------------------------------------------------------------------

def _dequant(levels, dcq: int, acq: int) -> list[int]:
    """Scan-order quantized levels → natural-order dequantized coefs."""
    out = [0] * 16
    for j, v in enumerate(levels):
        if v:
            out[ZIGZAG[j]] = v * (dcq if j == 0 else acq)
    return out


def reconstruct_frame(mb_w: int, mb_h: int, mbs: list[dict],
                      quants: list[tuple[int, ...]],
                      lf: dict) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """Normative keyframe reconstruction: per-MB intra prediction +
    inverse transforms, then the loop filter. ``mbs`` is the raster list
    of per-MB records: ymode, bmodes (16, when ymode == B_PRED), uvmode,
    segment, and quantized coefficient levels in scan order — 'y2' (16 or
    None), 'y' (16x16), 'u'/'v' (4x16 each). Returns UNCROPPED
    (mb_h*16, mb_w*16) Y and (mb_h*8, mb_w*8) U/V uint8 planes."""
    W, H = mb_w * 16, mb_h * 16
    # padded planes: row 0 = above border (127), col 0 = left border
    # (129), corner 127; 4 extra right columns feed subblock above-right
    Y = np.empty((H + 1, W + 5), np.int32)
    U = np.empty((H // 2 + 1, W // 2 + 1), np.int32)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[:, 0] = 129
        P[0, 0] = 127
    has_coeffs = [False] * len(mbs)

    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quants[mb["segment"]]
            up, left = my > 0, mx > 0
            x0, y0 = mx * 16 + 1, my * 16 + 1  # padded coords
            nz = False
            if mb["ymode"] != B_PRED:
                pred = _pred_full(
                    mb["ymode"], Y[y0 - 1, x0:x0 + 16], Y[y0:y0 + 16, x0 - 1],
                    Y[y0 - 1, x0 - 1], up, left, 16)
                dcs = [0] * 16
                if mb["y2"] is not None and any(mb["y2"]):
                    dcs = iwht4x4(_dequant(mb["y2"], y2dc, y2ac))
                    nz = True
                for b in range(16):
                    r, c = (b >> 2) * 4, (b & 3) * 4
                    levels = mb["y"][b]
                    if any(levels) or dcs[b]:
                        coefs = _dequant(levels, y1dc, y1ac)
                        coefs[0] = dcs[b]
                        pred[r:r + 4, c:c + 4] += idct4x4(coefs)
                        nz = nz or any(levels)
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred, 0, 255)
            else:
                for b in range(16):
                    r, c = (b >> 2) * 4, (b & 3) * 4
                    py, px = y0 + r, x0 + c
                    above = Y[py - 1, px:px + 4]
                    # above-right: right-edge subblocks always read the
                    # row ABOVE the macroblock (§12.3)
                    if c == 12:
                        ar = Y[y0 - 1, x0 + 16:x0 + 20]
                    else:
                        ar = Y[py - 1, px + 4:px + 8]
                    a8 = np.concatenate((above, ar))
                    pred = predict_b(mb["bmodes"][b], a8,
                                     Y[py:py + 4, px - 1],
                                     Y[py - 1, px - 1])
                    levels = mb["y"][b]
                    if any(levels):
                        pred = pred + idct4x4(_dequant(levels, y1dc, y1ac))
                        nz = True
                    Y[py:py + 4, px:px + 4] = np.clip(pred, 0, 255)
            xc, yc = mx * 8 + 1, my * 8 + 1
            for P, key in ((U, "u"), (V, "v")):
                pred = _pred_full(
                    mb["uvmode"], P[yc - 1, xc:xc + 8], P[yc:yc + 8, xc - 1],
                    P[yc - 1, xc - 1], up, left, 8)
                for b in range(4):
                    r, c = (b >> 1) * 4, (b & 1) * 4
                    levels = mb[key][b]
                    if any(levels):
                        pred[r:r + 4, c:c + 4] += idct4x4(
                            _dequant(levels, uvdc, uvac))
                        nz = True
                P[yc:yc + 8, xc:xc + 8] = np.clip(pred, 0, 255)
            has_coeffs[my * mb_w + mx] = nz
        # extend the right border: above-right of the rightmost MB in the
        # NEXT row replicates the row's last reconstructed pixel
        Y[y0:y0 + 16, W + 1:] = Y[y0:y0 + 16, W:W + 1]

    y = Y[1:, 1:W + 1].astype(np.uint8)
    u = U[1:, 1:].astype(np.uint8)
    v = V[1:, 1:].astype(np.uint8)
    if lf.get("level", 0) > 0:
        _loop_filter(y, u, v, mb_w, mb_h, mbs, has_coeffs, lf)
    return y, u, v


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 §15)
# ---------------------------------------------------------------------------

def _sclamp(x):
    return np.clip(x, -128, 127)


def _get_edge(plane, y0, x0, n, horiz, w):
    """Edge pixels as a (2w, n) int32 stack p_{w-1}..p0, q0..q_{w-1}."""
    if horiz:
        return plane[y0 - w:y0 + w, x0:x0 + n].astype(np.int32)
    return plane[y0:y0 + n, x0 - w:x0 + w].astype(np.int32).T


def _put_edge(plane, y0, x0, n, horiz, w, seg):
    out = np.clip(seg, 0, 255).astype(np.uint8)
    if horiz:
        plane[y0 - w:y0 + w, x0:x0 + n] = out
    else:
        plane[y0:y0 + n, x0 - w:x0 + w] = out.T


def _nfilter(seg, mask, hev, mb_edge: bool):
    """Normal filter on a (8, n) signed segment p3..q3 (RFC §15.2-15.3)."""
    p = seg - 128
    ps1, ps0, qs0, qs1 = p[2], p[3], p[4], p[5]
    if not mb_edge:
        a = _sclamp(np.where(hev, _sclamp(ps1 - qs1), 0) + 3 * (qs0 - ps0))
        a = np.where(mask, a, 0)
        f1 = _sclamp(a + 4) >> 3
        f2 = _sclamp(a + 3) >> 3
        p[4] = _sclamp(qs0 - f1)
        p[3] = _sclamp(ps0 + f2)
        a = np.where(hev, 0, (f1 + 1) >> 1)
        p[5] = _sclamp(qs1 - a)
        p[2] = _sclamp(ps1 + a)
    else:
        w0 = _sclamp(_sclamp(ps1 - qs1) + 3 * (qs0 - ps0))
        w0 = np.where(mask, w0, 0)
        fh = np.where(hev, w0, 0)
        f1 = _sclamp(fh + 4) >> 3
        f2 = _sclamp(fh + 3) >> 3
        qs0 = _sclamp(qs0 - f1)
        ps0 = _sclamp(ps0 + f2)
        w0 = np.where(hev, 0, w0)
        u = _sclamp((63 + w0 * 27) >> 7)
        qs0 = _sclamp(qs0 - u)
        ps0 = _sclamp(ps0 + u)
        u = _sclamp((63 + w0 * 18) >> 7)
        p[5] = _sclamp(p[5] - u)
        p[2] = _sclamp(p[2] + u)
        u = _sclamp((63 + w0 * 9) >> 7)
        p[6] = _sclamp(p[6] - u)
        p[1] = _sclamp(p[1] + u)
        p[4], p[3] = qs0, ps0
    return p + 128


def _filter_normal(plane, y0, x0, n, horiz, E, I, T, mb_edge):
    seg = _get_edge(plane, y0, x0, n, horiz, 4)
    p3, p2, p1, p0, q0, q1, q2, q3 = seg
    mask = ((np.abs(p3 - p2) <= I) & (np.abs(p2 - p1) <= I)
            & (np.abs(p1 - p0) <= I) & (np.abs(q1 - q0) <= I)
            & (np.abs(q2 - q1) <= I) & (np.abs(q3 - q2) <= I)
            & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E))
    hev = (np.abs(p1 - p0) > T) | (np.abs(q1 - q0) > T)
    _put_edge(plane, y0, x0, n, horiz, 4,
              _nfilter(seg, mask, hev, mb_edge))


def _filter_simple(plane, y0, x0, n, horiz, E):
    seg = _get_edge(plane, y0, x0, n, horiz, 2)
    p1, p0, q0, q1 = seg
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= E
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _sclamp(_sclamp(ps1 - qs1) + 3 * (qs0 - ps0))
    a = np.where(mask, a, 0)
    seg[2] = _sclamp(qs0 - (_sclamp(a + 4) >> 3)) + 128
    seg[1] = _sclamp(ps0 + (_sclamp(a + 3) >> 3)) + 128
    _put_edge(plane, y0, x0, n, horiz, 2, seg)


def mb_filter_level(mb: dict, lf: dict) -> int:
    """Per-MB loop-filter level: segment feature, then keyframe delta
    adjustments (intra ref delta; B_PRED mode delta)."""
    level = lf["level"]
    if lf.get("seg_enabled"):
        sv = lf["seg_lf"][mb["segment"]]
        level = sv if lf.get("seg_abs") else level + sv
        level = max(0, min(63, level))
    if lf.get("delta_enabled"):
        level += lf.get("ref_delta_intra", 0)
        if mb["ymode"] == B_PRED:
            level += lf.get("mode_delta_bpred", 0)
        level = max(0, min(63, level))
    return level


def _loop_filter(y, u, v, mb_w, mb_h, mbs, has_coeffs, lf):
    sharpness = lf.get("sharpness", 0)
    simple = lf.get("type", 0) == 1
    for my in range(mb_h):
        for mx in range(mb_w):
            i = my * mb_w + mx
            mb = mbs[i]
            level = mb_filter_level(mb, lf)
            if level == 0:
                continue
            interior = level
            if sharpness:
                interior >>= 1 if sharpness <= 4 else 2
                interior = min(interior, 9 - sharpness)
            interior = max(interior, 1)
            T = 2 if level >= 40 else 1 if level >= 15 else 0
            mb_lim = (level + 2) * 2 + interior
            sub_lim = level * 2 + interior
            inner = has_coeffs[i] or mb["ymode"] == B_PRED
            x0, y0 = mx * 16, my * 16
            xc, yc = mx * 8, my * 8
            if simple:
                if mx > 0:
                    _filter_simple(y, y0, x0, 16, False, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_simple(y, y0, x0 + dx, 16, False, sub_lim)
                if my > 0:
                    _filter_simple(y, y0, x0, 16, True, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_simple(y, y0 + dy, x0, 16, True, sub_lim)
                continue
            if mx > 0:
                _filter_normal(y, y0, x0, 16, False, mb_lim, interior, T,
                               True)
                _filter_normal(u, yc, xc, 8, False, mb_lim, interior, T,
                               True)
                _filter_normal(v, yc, xc, 8, False, mb_lim, interior, T,
                               True)
            if inner:
                for dx in (4, 8, 12):
                    _filter_normal(y, y0, x0 + dx, 16, False, sub_lim,
                                   interior, T, False)
                _filter_normal(u, yc, xc + 4, 8, False, sub_lim, interior,
                               T, False)
                _filter_normal(v, yc, xc + 4, 8, False, sub_lim, interior,
                               T, False)
            if my > 0:
                _filter_normal(y, y0, x0, 16, True, mb_lim, interior, T,
                               True)
                _filter_normal(u, yc, xc, 8, True, mb_lim, interior, T,
                               True)
                _filter_normal(v, yc, xc, 8, True, mb_lim, interior, T,
                               True)
            if inner:
                for dy in (4, 8, 12):
                    _filter_normal(y, y0 + dy, x0, 16, True, sub_lim,
                                   interior, T, False)
                _filter_normal(u, yc + 4, xc, 8, True, sub_lim, interior,
                               T, False)
                _filter_normal(v, yc + 4, xc, 8, True, sub_lim, interior,
                               T, False)


# ---------------------------------------------------------------------------
# Output conversion — the engine's documented convention
# ---------------------------------------------------------------------------

def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  width: int, height: int) -> np.ndarray:
    """Crop + nearest-neighbor chroma upsample + BT.601 studio-range
    conversion with floor(x+0.5) rounding. VP8 prescribes no normative
    upsampler or RGB matrix, so the engine fixes this deterministic one;
    it is shared by the generator so fingerprints agree by construction
    (libwebp's fancy upsampler differs by ±1-2 codes — parity tests
    therefore compare Y/U/V planes, not RGB)."""
    y = y[:height, :width].astype(np.float64)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    up = np.repeat(np.repeat(u[:ch, :cw], 2, axis=0), 2,
                   axis=1)[:height, :width].astype(np.float64)
    vp = np.repeat(np.repeat(v[:ch, :cw], 2, axis=0), 2,
                   axis=1)[:height, :width].astype(np.float64)
    yy = 1.164 * (y - 16.0)
    r = yy + 1.596 * (vp - 128.0)
    g = yy - 0.391 * (up - 128.0) - 0.813 * (vp - 128.0)
    b = yy + 2.018 * (up - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0.0, 255.0).astype(np.uint8)
