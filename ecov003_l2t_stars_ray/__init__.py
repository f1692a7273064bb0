"""ecov003_l2t_stars_ray — a Ray-Data-native time-series rollup engine.

A from-scratch engine with the query / data-processing capabilities of the
reference ECOv003-L2T-STARS Bayesian time-series fusion system (surveyed in
SURVEY.md), re-expressed over ``ray.data.Dataset`` pipelines:

- raw -> 1m -> 1h -> 1d continuous-aggregate rollup tiers over Parquet
  transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``
  (reference analog: the 70m/490m/980m resolution ladder,
  ``ECOv003_L2T_STARS/constants.py:29-31``);
- stateful Kalman/Bayesian gap-fill smoothers per (conv_id, metric) series
  (reference analog: the STARS fusion kernel,
  ``process_ECOSTRESS_data_fusion_distributed_bias.jl:350-393``);
- Gorilla delta-of-delta timestamp + XOR value compression per tier block;
- per-partition lineage manifest with watermarks and checkpoint epochs for
  resumable, exactly-once output (reference analog: file-exists skip +
  prior/posterior state chain, ``L2T_STARS.py:134-138,327-335``).

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"

from . import schema  # noqa: F401
