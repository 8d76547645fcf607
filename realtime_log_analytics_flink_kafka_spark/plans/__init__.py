from .inspect import (  # noqa: F401
    formatted_plan, has_broadcast_join, node_count, pushed_filters,
    python_eval_nodes, scan_read_schemas,
)
