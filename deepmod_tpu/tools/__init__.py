from .sum_chr_mod import merge_runs, merge_bed_dicts, read_bed_counts
from .motif_index import generate_motif_positions
from .cluster_predict import cluster_predict_run, build_cluster_features
from .evaluate import ecoli_performance
