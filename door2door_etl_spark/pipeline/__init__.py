from door2door_etl_spark.pipeline.bookkeeping import Bookkeeping
from door2door_etl_spark.pipeline.ingestor import run_ingestor
from door2door_etl_spark.pipeline.handler import run_handler
from door2door_etl_spark.pipeline.executor import run_workflow

__all__ = ["Bookkeeping", "run_ingestor", "run_handler", "run_workflow"]
