from door2door_etl_spark.queries.catalog import QUERIES, QueryDef

__all__ = ["QUERIES", "QueryDef"]
