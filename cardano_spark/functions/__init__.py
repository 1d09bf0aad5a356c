from cardano_spark.functions.scalars import (  # noqa: F401
    dec,
    dec6,
    github_handle,
    surrogate_id,
)
