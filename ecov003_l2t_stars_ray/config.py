"""Job configuration (the S8/S9 runconfig analog).

The reference parses a nested XML runconfig into a validated typed object
(``runconfig.py:13-65`` -> ``L2TSTARSConfig.py:25-190``) and can emit one
from a template (``generate_L2T_STARS_runconfig.py:199-247``). The engine
uses a plain dataclass with JSON (de)serialization and the same
validate-or-raise posture, consumed by the ``run_job`` CLI.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from .schema import GIVEUP_BUCKETS, TIERS


@dataclass
class RollupJobConfig:
    input_fragments: list[str] = field(default_factory=list)
    output_root: str = "/tmp/rollup_out"
    epoch: int = 1
    num_partitions: int = 64
    giveup_buckets: int = GIVEUP_BUCKETS
    smooth: bool = True
    tiers: list[str] = field(default_factory=lambda: list(TIERS))
    num_cpus: int | None = None  # None => caller owns ray.init

    def validate(self) -> "RollupJobConfig":
        if self.epoch < 0:
            raise ValueError("epoch must be >= 0")
        if self.num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        if self.giveup_buckets < 0:
            raise ValueError("giveup_buckets must be >= 0")
        unknown = set(self.tiers) - set(TIERS)
        if unknown:
            raise ValueError(f"unknown tiers: {sorted(unknown)}")
        if not self.output_root:
            raise ValueError("output_root required")
        return self

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RollupJobConfig":
        data = json.loads(text)
        unknown = set(data) - set(cls.__dataclass_fields__)
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data).validate()

    @classmethod
    def load(cls, path: str) -> "RollupJobConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
