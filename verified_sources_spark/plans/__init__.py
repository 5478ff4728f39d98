from verified_sources_spark.plans.queries import QUERIES  # noqa: F401
from verified_sources_spark.plans.oracle import ORACLE_SQL  # noqa: F401
