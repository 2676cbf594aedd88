"""A query written ONLY as a declarative spec (terrier_ray.api), proving the
user-extension surface executes the same operator layer end-to-end."""

from __future__ import annotations

from terrier_ray.api import build

#: big-ticket order count per customer nation — filter → broadcast join →
#: grouped aggregate, all as data
SPEC = {
    "scan": {"table": "orders", "columns": ["o_orderkey", "o_custkey", "o_totalprice"]},
    "ops": [
        {
            "op": "filter",
            "expr": {
                "fn": "greater",
                "args": [{"col": "o_totalprice"}, {"lit": 300000.0}],
            },
        },
        {
            "op": "join",
            "right": {"scan": {"table": "customer", "columns": ["c_custkey", "c_nationkey"]}},
            "on": ["o_custkey"],
            "right_on": ["c_custkey"],
            "broadcast": True,
        },
        {
            "op": "group_agg",
            "keys": ["c_nationkey"],
            "aggs": [["count", "o_orderkey", "n_big"]],
        },
    ],
}


def spec_big_orders_by_nation(sf_dir: str):
    return build(SPEC, sf_dir)


SQL = {
    "spec_big_orders_by_nation": """
        SELECT c_nationkey, COUNT(o_orderkey) AS n_big
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 300000
        GROUP BY c_nationkey
    """,
}

QUERIES = {"spec_big_orders_by_nation": spec_big_orders_by_nation}
