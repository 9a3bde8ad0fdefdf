from erkg_tutorials_spark.plans.registry import QUERIES, ORACLES
