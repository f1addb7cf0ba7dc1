from mallard_spark.functions.numeric import davg, dsum

__all__ = ["dsum", "davg"]
