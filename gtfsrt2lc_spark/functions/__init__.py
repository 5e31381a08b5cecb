from gtfsrt2lc_spark.functions.text import extract_text_bytes, extract_text_udf  # noqa: F401
