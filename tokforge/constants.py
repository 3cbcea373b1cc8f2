"""Engine-wide constants for the token-transform domain.

The token domain re-expresses imgforge's image semantics (reference:
/root/reference, `src/processing/*`) over 1-D int32 token sequences:
an image's width maps to sequence length ``n_tok``, pixel values map to
token ids in ``[0, VOCAB)``, and the watermark asset maps to a reserved
sentinel id range so injected tokens stay detectable downstream.
"""

from __future__ import annotations

# Token vocabulary (GPT-2-ish size; all data tokens are in [0, VOCAB)).
VOCAB = 50257

# Reserved sentinel range for watermark-injected tokens
# (reference analog: the watermark overlay pixels, src/processing/watermark.rs).
SENTINEL_BASE = 50300
SENTINEL_RANGE = 100
SENTINEL_MAX = SENTINEL_BASE + SENTINEL_RANGE - 1  # 50399

# Default signing credentials for tests/benches (hex, like IMGFORGE_KEY/IMGFORGE_SALT).
DEFAULT_KEY_HEX = "7365637265746b6579"  # "secretkey"
DEFAULT_SALT_HEX = "73616c74"  # "salt"

# Default output "format" when the chain names none
# (reference: service.rs:143-149 falls back to jpeg).
DEFAULT_FORMAT = "jpeg"

# Default encode quality (reference: mod.rs:232-235).
DEFAULT_QUALITY = 85

# Output dtype registry: format name -> (dtype label, element bytes, lossy?,
# value rule).  Value rules:
#   "none"     : values unchanged
#   "saturate" : clamp into int16 range (webp analog: saturating cast)
#   "mod256"   : value % 256 (gif/uint8 analog: 8-bit wraparound)
# Lossy formats additionally quantize by the quality-derived step
# (reference: save.rs encoders; SURVEY.md §2.3 token mapping).
FORMAT_SPECS = {
    "jpeg": ("int32", 4, True, "none"),
    "jpg": ("int32", 4, True, "none"),
    "png": ("int32", 4, False, "none"),
    "webp": ("int16", 2, False, "saturate"),
    "gif": ("int16", 2, False, "mod256"),
    "tiff": ("int64", 8, False, "none"),
    "avif": ("int32", 4, True, "none"),
    "heif": ("int32", 4, True, "none"),
    # Direct dtype spellings (token-domain native names).
    "int32": ("int32", 4, False, "none"),
    "int16": ("int16", 2, False, "saturate"),
    "uint8": ("int16", 2, False, "mod256"),
    "int64": ("int64", 8, False, "none"),
}

INT16_MAX = 32767
INT16_MIN = -32768

# Watermark geometry (reference: watermark.rs:108-115 resizes the asset to 1/4
# of the main width; :187-206 places it with a 5% margin).
WM_FRACTION_DEN = 4
WM_MARGIN_FRAC = 0.05
