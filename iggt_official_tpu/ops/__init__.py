"""TPU kernels and numeric ops: attention, resize, KNN, clustering, PCA."""
