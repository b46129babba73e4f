from aleph2_contrib_spark.functions.query import Q, SingleQuery, MultiQuery, compile_query, apply_query  # noqa: F401
from aleph2_contrib_spark.functions.update import U, apply_update, delete_by_spec  # noqa: F401
