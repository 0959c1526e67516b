"""Pipeline configuration — the analog of the reference's sketching params.

The reference serializes its sketch parameters (kmer size, sketch size,
window len/stride) into the database artifact and refuses to load a DB
whose widths mismatch (/root/reference/src/sketch_database.h:869-922).
We mirror that: every checkpoint directory carries ``config.json`` and a
resume refuses a checkpoint whose config differs (see state/checkpoint.py).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields


@dataclass(frozen=True)
class DedupConfig:
    """All knobs that affect *values* produced by the dedup pipeline.

    Defaults mirror the reference's shape where a direct analog exists:
    reference k=16 char k-mers (/root/reference/src/mode_build.cpp:65-68)
    -> ``shingle_k=16`` char shingles over normalized text; reference
    sketchlen=16 bottom-s sketch -> 128 independent min-hash permutations
    (the classic web-dedup configuration); the reference's per-feature
    location cap of 255 (/root/reference/src/config.h:77) -> bucket_cap.
    """

    # --- text normalization (versioned: bump when semantics change) ---
    normalization: str = "norm-v1"  # lowercase + whitespace collapse + strip

    # --- shingling / MinHash (analog of sketcher params, T3) ---
    shingle_k: int = 16          # char-level shingle width over normalized text
    n_perms: int = 128           # signature length (perms / OPH bins)
    seed: int = 0x5EED_CAFE      # seeds the permutation constants
    # "oph": one-permutation hashing + rotation densification — one pass
    #   over the shingle stream (O(M)), the at-scale scheme;
    # "kperm": classic n_perms independent (a*h+b) permutations
    #   (O(M * n_perms)) — the reference-shaped scheme.
    # Both are unbiased Jaccard estimators; signatures are NOT
    # compatible across schemes (config guard protects checkpoints).
    minhash_scheme: str = "oph"

    # --- LSH banding ---
    n_bands: int = 32            # n_perms must be divisible by n_bands
    # rows per band = n_perms // n_bands  (32 x 4 -> ~0.42 S-curve midpoint)

    # --- candidate generation / skew control (analog of D3 feature cap) ---
    bucket_cap: int = 256        # buckets larger than this are dropped (hot keys)

    # --- pair verification / clustering ---
    sim_threshold: float = 0.7   # Jaccard similarity defining a duplicate pair
    verify_margin: float = 0.05  # verify at (threshold - margin) to absorb
                                 # MinHash estimation noise (sigma ~ 0.04 @128)

    # --- substring (suffix/anchor) stage ---
    anchor_len: int = 64         # exact-match anchor length (chars)
    anchor_mod: int = 8          # keep anchors where hash % mod == 0 (winnowing-ish)
    min_match_len: int = 256     # minimum shared-substring length to count as dup

    # --- SimHash ---
    simhash_bits: int = 64
    simhash_hamming: int = 3     # max Hamming distance for a simhash dup pair

    def __post_init__(self) -> None:
        if self.n_perms % self.n_bands != 0:
            raise ValueError(
                f"n_perms ({self.n_perms}) must be divisible by n_bands ({self.n_bands})"
            )
        if self.minhash_scheme == "oph" and (self.n_perms & (self.n_perms - 1)) != 0:
            # the OPH binner maps shingles to bins with a bit shift
            # (hashes >> (64 - log2(n_bins))); a non-power-of-two bin
            # count would leave the top bins natively unreachable and
            # silently degrade the estimator via densification back-fill
            raise ValueError(
                f"minhash_scheme='oph' requires n_perms to be a power of two "
                f"(got {self.n_perms}); use scheme='kperm' for other sizes"
            )

    @property
    def rows_per_band(self) -> int:
        return self.n_perms // self.n_bands

    @property
    def verify_threshold(self) -> float:
        return self.sim_threshold - self.verify_margin

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "DedupConfig":
        d = json.loads(s)
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


DEFAULT_CONFIG = DedupConfig()
