from dbms_data_anonymity_differential_privacy_spark.sources.readers import load_table, load_tables, read_adult_csv

__all__ = ["load_table", "load_tables", "read_adult_csv"]
