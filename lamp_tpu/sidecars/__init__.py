"""Classic-ML sidecars: kNN, k-means, UMAP, extremely randomized trees."""

from .knn import (
    jaccard_distance,
    knn_classification,
    knn_regression,
    knn_search,
    knn_search_nn_descent,
    squared_euclidean_distance,
)
from .kmeans import KMeansResult, kmeans_assign, kmeans_plus_plus_init, minibatch_kmeans
from .umap import (
    find_ab_params,
    smooth_knn_weights,
    spectral_init,
    umap,
    umap_custom_knn,
)
from .extratrees import (
    build_forest_classification,
    build_forest_regression,
    load_forest,
    predict_classification,
    predict_regression,
    save_forest,
)

__all__ = [
    "squared_euclidean_distance",
    "jaccard_distance",
    "knn_search",
    "knn_search_nn_descent",
    "knn_classification",
    "knn_regression",
    "minibatch_kmeans",
    "kmeans_plus_plus_init",
    "kmeans_assign",
    "KMeansResult",
    "umap",
    "umap_custom_knn",
    "smooth_knn_weights",
    "spectral_init",
    "find_ab_params",
    "build_forest_classification",
    "build_forest_regression",
    "predict_classification",
    "predict_regression",
    "save_forest",
    "load_forest",
]
