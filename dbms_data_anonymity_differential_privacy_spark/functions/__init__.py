from dbms_data_anonymity_differential_privacy_spark.functions.binning import bin_equal_width, bin_explicit_edges

__all__ = ["bin_equal_width", "bin_explicit_edges"]
