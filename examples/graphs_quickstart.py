#!/usr/bin/env python
"""Load the MovieGraphs graphs and poke at them — the counterpart of the
reference's `moviegraphs/py3loader/startup.py` (its only documented way
into the graph API).

    python examples/graphs_quickstart.py [mg3.pkl | annotations-dir]

With no argument, generates a synthetic MovieGraphs-format drop first.
Works on both graph sources the framework reads: the reference's
networkx-1.11 ``mg3.pkl`` pickle (via the compatibility shim) and the
per-movie JSON annotation dumps.
"""

import os.path as ops
import sys
import tempfile

sys.path.insert(0, ops.dirname(ops.dirname(ops.abspath(__file__))))

from lirec_tpu.data import graphs, synthetic


def main() -> None:
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        root = tempfile.mkdtemp()
        print("== no source given; generating synthetic data at", root)
        src = synthetic.generate(root).paths.annotations

    # all_mg: imdb key -> MovieGraph (ref startup.py:9-17)
    if ops.isfile(src):
        all_mg = graphs.load_mg_pickle(src)
    else:
        all_mg = graphs.load_graphs(src)
    print("Found %d movies with graphs" % len(all_mg))

    imdb_key, mg = next(iter(all_mg.items()))
    print("Selected movie: %s" % mg.imdb_key)

    # castlist (ref startup.py:22-25): present when the pickle/authoring
    # pipeline attached one (MovieGraph.attach_information)
    print()
    if hasattr(mg, "castlist"):
        print("Cast in this movie:")
        for character in mg.castlist:
            print(character["chid"], character["name"])
    else:
        print("Characters in this movie (no castlist attached):")
        for name in mg.characters():
            print(" ", name)

    # one clip graph, pretty-printed (ref startup.py:27-31)
    print()
    print("Selected one clip graph")
    cg = next(iter(mg.clip_graphs.values()))
    cg.pprint()

    # a few queries startup.py readers go on to use
    print()
    print("Interaction triplets in this clip:")
    for s, m, t in cg.find_all_triplets("interaction", return_names=True):
        print("  %s -[%s]-> %s" % (s, m, t))


if __name__ == "__main__":
    main()
