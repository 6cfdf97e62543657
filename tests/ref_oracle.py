"""Import-and-drive harness for the ACTUAL reference implementation.

The round-1 parity story rested on builder-written transcriptions; this
module lets tests execute the reference's own code (/root/reference) as
the oracle instead (VERDICT.md "Next round" #1/#2).

The reference imports TensorFlow 1.x at module scope (myMultiBiRNN.py:1-2
plus a module-level ``tf.constant`` at :15) but none of the host-side
functions under test touch TF at call time, so we satisfy the import with
a stub, import the package, then restore ``sys.modules`` so other tests
can still import the real TensorFlow. Two small compatibility shims are
installed (and left in place — they only ADD legacy aliases):

- ``np.int`` / ``np.float`` (removed in numpy>=1.24; used at
  myDetect.py:660,752,1022);
- ``h5py.Dataset.value`` (removed in h5py 3.x; used at myDetect.py:157,
  1019 and EventTable.py:131-132).

Nothing here copies reference code — it imports and calls it.
"""

from __future__ import annotations

import sys
import types
from collections import defaultdict
from types import SimpleNamespace

import numpy as np

REF_BIN = "/root/reference/bin"

_NS = None


def _ensure_shims() -> None:
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    import h5py

    if not hasattr(h5py.Dataset, "value"):
        h5py.Dataset.value = property(lambda self: self[()])


def modules() -> SimpleNamespace:
    """Import the reference package once; returns a namespace with
    myCom/myDetect/myGetFeatureBasedPos/EventTable/MoveTable."""
    global _NS
    if _NS is not None:
        return _NS
    _ensure_shims()

    tf_names = ("tensorflow", "tensorflow.contrib", "tensorflow.contrib.rnn")
    saved = {k: sys.modules.get(k) for k in tf_names}
    tf = types.ModuleType("tensorflow")
    tf.constant = lambda value, *a, **k: np.asarray(value)
    contrib = types.ModuleType("tensorflow.contrib")
    rnn = types.ModuleType("tensorflow.contrib.rnn")
    contrib.rnn = rnn
    tf.contrib = contrib
    sys.modules["tensorflow"] = tf
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.rnn"] = rnn
    if REF_BIN not in sys.path:
        sys.path.insert(0, REF_BIN)
    try:
        import DeepMod_scripts.EventTable as EventTable
        import DeepMod_scripts.MoveTable as MoveTable
        import DeepMod_scripts.myCom as myCom
        import DeepMod_scripts.myDetect as myDetect
        import DeepMod_scripts.myGetFeatureBasedPos as myGFBP
        import DeepMod_scripts.myMultiBiRNN as myMultiBiRNN
    finally:
        # let later tests import the real TensorFlow; the reference
        # modules keep their references to the stub via their globals
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    _NS = SimpleNamespace(
        myCom=myCom,
        myDetect=myDetect,
        myGFBP=myGFBP,
        myMultiBiRNN=myMultiBiRNN,
        EventTable=EventTable,
        MoveTable=MoveTable,
    )
    return _NS


def base_moptions(**overrides):
    """The moptions dict shared by every reference entry point
    (bin/DeepMod.py:48-93), silenced to OUTPUT_ERROR."""
    md = modules()
    m = defaultdict(lambda: None)
    m.update(
        {
            "outLevel": md.myCom.OUTPUT_ERROR,
            "basecall_1d": "Basecall_1D_000",
            "basecall_2strand": "BaseCalled_template",
            "move": False,
            "SignalGroup": "simple",
            "ConUnk": True,
            "fnum": 7,
            "hidden": 100,
            "windowsize": 21,
            "alignStr": "minimap2",
            "Base": "C",
            "mod_cluster": 0,
        }
    )
    m.update(overrides)
    return m


def ref_get_event_signals(f5files, **overrides):
    """Run the reference's full ingestion chain (get_Event_Signals,
    myDetect.py:348-386) and return (f5data, errors)."""
    md = modules()
    moptions = base_moptions(**overrides)
    sp_options = defaultdict()
    f5data = md.myDetect.get_Event_Signals(moptions, sp_options, f5files)
    return f5data, dict(sp_options["Error"])


class RuleSession:
    """Stands in for the TF session inside mPredict1 (myDetect.py:805-820).

    ``run(init)`` (no feed) is a no-op; ``run([mfpred], feed_dict)``
    applies ``rule`` to the (N, 21, fnum) window batch fed as 'X'.
    Every window fed is recorded so tests can differential-compare the
    feature windows themselves.
    """

    def __init__(self, rule):
        self.rule = rule
        self.windows = []

    def run(self, fetches, feed_dict=None):
        if feed_dict is None:
            return None
        x = np.asarray(feed_dict["X"])
        self.windows.append(x)
        return [np.asarray(self.rule(x), dtype=np.int64)]


def center_mean_rule(x: np.ndarray) -> np.ndarray:
    """Deterministic stand-in classifier: 1 iff the center event's
    normalized mean (feature column fnum-3) is positive. Exact under both
    float32 and float64 feature representations (the value is a
    3-decimal-rounded float32 either way)."""
    center = x.shape[1] // 2
    return (x[:, center, x.shape[2] - 3] > 0).astype(np.int64)


def ref_detect_batch(
    f5data,
    sam_lines,
    ref_info,
    ctfolder,
    batchid=0,
    rule=center_mean_rule,
    **overrides,
):
    """Drive the reference detect path (handle_line + handle_record,
    myDetect.py:929-943, 488-782) over pre-aligned SAM lines with a
    rule-based stand-in for the RNN. Returns the sp_options (carrying
    'Mod' index entries and 'Error') and the RuleSession (carrying every
    window batch fed to the 'model')."""
    md = modules()
    moptions = base_moptions(**overrides)
    if moptions["region"] is None:
        moptions["region"] = [(None, None, None)]

    sp_param = defaultdict()
    sp_param["f5data"] = f5data
    sp_param["ref_info"] = dict(ref_info)  # pre-filled: no samtools needed
    f5align = defaultdict()
    for line in sam_lines:
        if not line or line[0] == "@":
            continue
        sp_param["f5status"] = ""
        sp_param["line"] = line
        md.myDetect.handle_line(moptions, sp_param, f5align)

    session = RuleSession(rule)
    sp_options = defaultdict()
    sp_options["ctfolder"] = ctfolder
    sp_options["batchid"] = batchid
    sp_options["Mod"] = []
    sp_options["Error"] = defaultdict(list)
    sp_options["rnn"] = (session, "X", "Y", "init", "mfpred")
    sp_param["f5status"] = ""
    sp_param["line"] = ""
    md.myDetect.handle_record(moptions, sp_options, sp_param, f5align, f5data)
    return sp_options, session


def ref_getfeatures_batch(
    f5data, sam_lines, ref_info, ctfolder, **overrides
):
    """Drive the reference getfeatures path (myGetFeatureBasedPos.py
    handle_line + handle_record :541-559, :109-350) over pre-aligned SAM
    lines; writes <n>.xy.gz/.xy.ind under ctfolder. Returns sp_options."""
    md = modules()
    moptions = base_moptions(**overrides)
    if moptions["region"] is None:
        moptions["region"] = (None, None, None)

    sp_param = defaultdict()
    sp_param["f5data"] = f5data
    sp_param["ref_info"] = dict(ref_info)
    f5align = defaultdict()
    for line in sam_lines:
        if not line or line[0] == "@":
            continue
        sp_param["f5status"] = ""
        sp_param["line"] = line
        md.myGFBP.handle_line(moptions, sp_param, f5align)

    sp_options = defaultdict()
    sp_options["ctfolder"] = ctfolder
    sp_options["Error"] = defaultdict(list)
    sp_param["f5status"] = ""
    sp_param["line"] = ""
    md.myGFBP.handle_record(moptions, sp_options, sp_param, f5align, f5data)
    return sp_options


def ref_sum_handler(index_files, out_folder, base="C", mod_cluster=0):
    """Run the reference genomic summarizer (sum_handler,
    myDetect.py:1028-1120) over existing index + predetail files.
    ``index_files``: list of (index_path, chr, strand). BEDs are written
    under ``out_folder``; returns their paths."""
    import queue

    md = modules()
    moptions = base_moptions(
        Base=base, mod_cluster=mod_cluster, outFolder=out_folder
    )
    q = queue.Queue()
    for item in index_files:
        q.put(item)
    md.myDetect.sum_handler(moptions, q)
    prefix = "cluster_mod_pos" if mod_cluster else "mod_pos"
    return [
        f"{out_folder}/{prefix}.{chrom}{strand}.{base}.bed"
        for _, chrom, strand in index_files
    ]


def ref_read_motif_mod(fadict, mpat="CG", mposinpat=0):
    """The reference's motif label scan (readMotifMod,
    myGetFeatureBasedPos.py:615-647): returns (fulmod, candidates)."""
    md = modules()
    return md.myGFBP.readMotifMod(fadict, mpat, mposinpat)
