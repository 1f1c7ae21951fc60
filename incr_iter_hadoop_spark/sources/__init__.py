from .readers import (  # noqa: F401
    read_delta_triples,
    read_jdbc,
    read_kv_text,
    read_text_lines,
    read_typed_kv,
    write_iteration_snapshot,
)
