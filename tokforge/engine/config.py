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
    # Streaming state-store tier (reference: the foyer memory/disk/hybrid
    # cache, caching/cache.rs:258-327): "hdfs" = default in-heap provider
    # (memory tier), "rocksdb" = RocksDBStateStoreProvider (disk tier with
    # changelog checkpointing) — the 100 TB story for state larger than
    # executor heap.  Applied by session.apply_state_store / build_spark.
    state_store: str = "hdfs"
    # Capacity-bounded LRU eviction for the cache/info state namespaces
    # (reference: foyer's hard entry capacities, caching/config.rs:54-66,
    # LRU eviction cache.rs:152-165).  Per-BUCKET entry cap; the global
    # state budget is buckets x this cap (16384 x cap by default).  0 =
    # unbounded (TTL/idle-timeout eviction only) — at 10^12 keys a real
    # deployment sets this so state is bounded by budget, not by
    # active-keys-per-TTL.
    cache_capacity_per_bucket: int = 0

    @property
    def key(self) -> bytes:
        return bytes.fromhex(self.key_hex)

    @property
    def salt(self) -> bytes:
        return bytes.fromhex(self.salt_hex)

    @property
    def presets_dict(self) -> dict[str, str]:
        return dict(self.presets)

    @classmethod
    def from_env(cls, env: "dict[str, str] | None" = None) -> "EngineConfig":
        """Build a config from TOKFORGE_* environment variables — the
        deployment surface the reference exposes as IMGFORGE_* env config
        (reference: config.rs:224-286).  Unset variables keep the dataclass
        defaults; booleans accept 1/true/yes (case-insensitive); presets
        use the reference's `name=chain;name2=chain2` shape
        (config.rs presets parsing); the dtype allowlist is a CSV."""
        import os

        e = os.environ if env is None else env

        def _bool(name: str, default: bool) -> bool:
            v = e.get(name)
            if v is None:
                return default
            return v.strip().lower() in ("1", "true", "yes")

        presets: tuple[tuple[str, str], ...] = ()
        if e.get("TOKFORGE_PRESETS"):
            presets = tuple(
                (p.split("=", 1)[0].strip(), p.split("=", 1)[1].strip())
                for p in e["TOKFORGE_PRESETS"].split(";")
                if "=" in p
            )
        allowed = None
        if e.get("TOKFORGE_ALLOWED_SRC_DTYPES"):
            allowed = tuple(
                s.strip().lower()
                for s in e["TOKFORGE_ALLOWED_SRC_DTYPES"].split(",")
                if s.strip()
            )
        d = EngineConfig()  # defaults
        return cls(
            key_hex=e.get("TOKFORGE_KEY", d.key_hex),
            salt_hex=e.get("TOKFORGE_SALT", d.salt_hex),
            allow_unsigned=_bool("TOKFORGE_ALLOW_UNSAFE_URL", d.allow_unsigned),
            presets=presets or d.presets,
            only_presets=_bool("TOKFORGE_ONLY_PRESETS", d.only_presets),
            default_format=e.get("TOKFORGE_DEFAULT_FORMAT", d.default_format),
            allow_security_options=_bool(
                "TOKFORGE_ALLOW_SECURITY_OPTIONS", d.allow_security_options
            ),
            max_src_file_size=(
                int(e["TOKFORGE_MAX_SRC_FILE_SIZE"])
                if e.get("TOKFORGE_MAX_SRC_FILE_SIZE")
                else d.max_src_file_size
            ),
            max_src_resolution=(
                float(e["TOKFORGE_MAX_SRC_RESOLUTION"])
                if e.get("TOKFORGE_MAX_SRC_RESOLUTION")
                else d.max_src_resolution
            ),
            bearer_token=e.get("TOKFORGE_BEARER_TOKEN", d.bearer_token),
            allowed_src_dtypes=allowed if allowed is not None else d.allowed_src_dtypes,
            state_store=e.get("TOKFORGE_STATE_STORE", d.state_store).strip().lower(),
            cache_capacity_per_bucket=(
                int(e["TOKFORGE_CACHE_CAPACITY_PER_BUCKET"])
                if e.get("TOKFORGE_CACHE_CAPACITY_PER_BUCKET")
                else d.cache_capacity_per_bucket
            ),
        )


DEFAULT_CONFIG = EngineConfig()
