"""MLlib-backed capabilities the reference declares but never implements
(SURVEY §2.9 C3-C5): RFM KMeans segmentation, ALS collaborative
filtering, z-score anomaly detection. Model fitting is deterministic
(fixed seeds); the anomaly detector is pure window arithmetic and
oracle-checked."""
