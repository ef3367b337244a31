"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` exposes the operator inventory (SURVEY.md §2 + training-data
ops); ``oracle_sql()`` the DuckDB equivalents where SQL can express the
semantics. Column names and float rounding are kept identical on both sides.
"""

from __future__ import annotations

import sys
import os
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: CDC latest-state compaction over the sf0.001 events stream."""
    from canal_ray.ops.relational import latest_events_by_user

    return latest_events_by_user("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from canal_ray.ops import relational as R

    return {
        # --- CDC semantics over the events change stream -----------------
        "cdc_latest_state_by_user": R.latest_events_by_user,
        "cdc_event_type_stats": R.event_type_stats,
        "cdc_hourly_event_counts": R.hourly_event_counts,
        "cdc_sessionize_users": R.sessionize_users,
        # --- relational coverage ----------------------------------------
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_building_order_revenue": R.building_segment_order_revenue,
        "supplier_balance_by_region": R.supplier_balance_by_region,
        "order_priority_counts": R.order_priority_counts,
    }


def oracle_sql() -> dict[str, str]:
    from canal_ray.ops.oracles import RELATIONAL_SQL

    return dict(RELATIONAL_SQL)
