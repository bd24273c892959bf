from .runner import EndpointSpec, run_backfill, run_incremental_cycle

__all__ = ["EndpointSpec", "run_backfill", "run_incremental_cycle"]
