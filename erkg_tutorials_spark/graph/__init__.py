from erkg_tutorials_spark.graph.khop import k_hop, k_hop_labeled
