"""search_rs_spark — PySpark-native rebuild of tomfran/search-rs."""
