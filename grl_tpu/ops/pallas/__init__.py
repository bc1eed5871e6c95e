from grl_tpu.ops.pallas.relagg import (
    pallas_dropedge_aggregate,
    pallas_neighbor_aggregate,
)

__all__ = ["pallas_dropedge_aggregate", "pallas_neighbor_aggregate"]
