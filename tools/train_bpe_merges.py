"""Regenerate functions/text.py::PINNED_BPE_MERGES from the sf0.001
documents corpus (deterministic — see train_bpe's tie-break note).
Usage: python tools/train_bpe_merges.py [sf_dir] [num_merges]"""
import re
import sys
from collections import Counter

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
from parquet_producers_ray.functions.text import BPE_WORD_RE, train_bpe

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
nm = int(sys.argv[2]) if len(sys.argv) > 2 else 48
t = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
wc: Counter = Counter()
rx = re.compile(BPE_WORD_RE)
for txt in t.column("text").to_pylist():
    wc.update(rx.findall(txt.lower()))
merges = train_bpe(dict(wc), nm)
print(f"# trained on {sf} ({sum(wc.values())} pre-tokens, "
      f"{len(wc)} distinct) num_merges={nm} -> {len(merges)} merges")
print("PINNED_BPE_MERGES: list = [")
for i in range(0, len(merges), 4):
    row = ", ".join(repr(p) for p in merges[i:i + 4])
    print(f"    {row},")
print("]")
