from tpugraph.viz.graphs import denoise_graph, log_graph, save_matrix_image  # noqa: F401
