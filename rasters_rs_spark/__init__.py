"""rasters_rs_spark: a PySpark-native spatial-join + tiling engine.

From-scratch re-expression of the query and data-processing capabilities
of AspecScire/rasters.rs on the Spark DataFrame API: chunk planning,
affine alignment joins, zonal statistics via cell-keyed point-in-polygon
joins, web-mercator tiling with fractional-area resampling and a
quantized tile codec, k-ring kNN interpolation, plus the training-data
pipeline layer (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB image+caption corpus needs.
"""

__version__ = "0.1.0"
