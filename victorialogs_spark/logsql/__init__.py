from victorialogs_spark.logsql.parser import parse_query, ParseError

__all__ = ["parse_query", "ParseError"]
