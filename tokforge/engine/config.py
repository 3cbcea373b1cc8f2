"""Engine configuration (reference: src/config.rs IMGFORGE_* env surface).

One small picklable dataclass broadcast into every pandas UDF closure —
the Spark analog of the reference's process-wide Config + presets map.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tokforge.constants import DEFAULT_KEY_HEX, DEFAULT_SALT_HEX


@dataclass(frozen=True)
class EngineConfig:
    key_hex: str = DEFAULT_KEY_HEX
    salt_hex: str = DEFAULT_SALT_HEX
    allow_unsigned: bool = False  # IMGFORGE_ALLOW_UNSAFE_URL analog
    presets: tuple[tuple[str, str], ...] = ()  # name -> options string
    only_presets: bool = False
    default_format: str | None = None  # None -> use the source dtype (sniffed)
    allow_security_options: bool = False  # reference: service.rs:550-570
    max_src_file_size: int | None = None  # global cap, bytes (n_tok * 4)
    max_src_resolution: float | None = None  # global cap, "megatokens"
    # Bearer-secret gate (reference: service.rs:432-446): when set, rows
    # must carry a matching `bearer` column or they are rejected (403).
    bearer_token: str | None = None
    # Source-type allowlist (reference: service.rs:500-510 MIME allowlist):
    # when set, rows whose src_dtype is not listed are rejected.
    allowed_src_dtypes: tuple[str, ...] | None = None

    @property
    def key(self) -> bytes:
        return bytes.fromhex(self.key_hex)

    @property
    def salt(self) -> bytes:
        return bytes.fromhex(self.salt_hex)

    @property
    def presets_dict(self) -> dict[str, str]:
        return dict(self.presets)


DEFAULT_CONFIG = EngineConfig()
