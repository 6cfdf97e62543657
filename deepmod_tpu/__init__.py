"""deepmod_tpu — a TPU-native nanopore DNA-modification calling framework.

A from-scratch re-design of the capabilities of WGLab/DeepMod
(/root/reference) for TPU hardware:

- the 3-layer bidirectional LSTM modification classifier runs as a batched
  ``jax.lax.scan`` with an optional Pallas fused-cell kernel
  (reference: bin/DeepMod_scripts/myMultiBiRNN.py:21-91);
- fast5/event/signal ingestion is vectorized host-side numpy with a native
  C++ fast path (reference: bin/DeepMod_scripts/myDetect.py:133-386);
- alignment is an in-process seed-chain-extend aligner (the reference shells
  out to minimap2/bwa per batch, myDetect.py:406-424);
- per-genomic-position aggregation is an on-device segment-sum merged with
  ``psum`` collectives across a device mesh (the reference merges BED files
  through the filesystem, myDetect.py:1196-1221).

Public API:
    deepmod_tpu.models   - BiLSTM classifier, cluster-effect MLP, TF import
    deepmod_tpu.io       - fast5 reading, event tables, signal normalization
    deepmod_tpu.align    - aligners and CIGAR -> base map expansion
    deepmod_tpu.features - per-event feature matrices and model windows
    deepmod_tpu.engine   - end-to-end detect pipeline
    deepmod_tpu.train    - data loading + pjit data-parallel training
    deepmod_tpu.aggregate- per-position summaries and BED emission
    deepmod_tpu.parallel - mesh construction and sharded steps
    deepmod_tpu.tools    - post-hoc tools (merge, motif index, evaluation,
                           cluster-effect second stage)
"""

__version__ = "0.1.0"
