import numpy as np
import pytest

from lirec_tpu.data import annotations, graphs, synthetic, vocab


def test_digraph_basic():
    g = graphs.Digraph()
    g.add_node(1, name="a", type="entity")
    g.add_node(2, name="b", type="entity")
    g.add_node(10, name="hugs", type="interaction")
    g.add_edge(1, 10)
    g.add_edge(10, 2)
    assert g.has_edge(1, 10) and not g.has_edge(10, 1)
    assert g.neighbors(10) == [2]
    assert g.predecessors(10) == [1]


def test_clip_graph_load(synth_cfg):
    movies = graphs.load_graphs(synth_cfg.paths.annotations)
    assert set(movies) == {"tt0108160", "tt1454029", "tt0120338"}
    movie = movies["tt0108160"]
    clip = next(iter(movie.clip_graphs.values()))
    assert clip.video["movie"] == "tt0108160"
    assert clip.video["scene"] == [2]
    entities = clip.get_node_ids_of_type("entity")
    assert len(entities) == 3
    # substring semantics: 'interactions' (plural) matches 'interaction' nodes
    assert clip.get_node_ids_of_type("interactions") == clip.get_node_ids_of_type(
        "interaction"
    )
    # tuple form is exact membership: plural does NOT match there
    assert clip.get_node_ids_of_type(("interactions", "summary")) == []
    assert clip.get_node_ids_of_type(("interaction", "summary"))


def test_mg_pickle_shim(tmp_path, synth_cfg):
    """mg3.pkl-style pickles (networkx-1.11 internals) load via the shim."""
    import pickle
    import sys
    import types

    movies = graphs.load_graphs(synth_cfg.paths.annotations)
    clip = next(iter(movies["tt0108160"].clip_graphs.values()))

    # Fabricate fake GraphClasses/networkx module objects mimicking the
    # pickle layout: MovieGraph{imdb_key, clip_graphs}, ClipGraph{video, G},
    # DiGraph{node, adj}.
    gc_mod = types.ModuleType("GraphClasses")
    nx_mod = types.ModuleType("networkx")
    nx_classes = types.ModuleType("networkx.classes.digraph")

    MovieGraph = type("MovieGraph", (), {"__module__": "GraphClasses"})
    ClipGraph = type("ClipGraph", (), {"__module__": "GraphClasses"})
    DiGraph = type("DiGraph", (), {"__module__": "networkx.classes.digraph"})

    gc_mod.MovieGraph = MovieGraph
    gc_mod.ClipGraph = ClipGraph
    nx_classes.DiGraph = DiGraph
    sys.modules["GraphClasses"] = gc_mod
    sys.modules["networkx"] = nx_mod
    sys.modules["networkx.classes.digraph"] = nx_classes
    try:
        g = DiGraph()
        g.node = {nid: dict(attrs) for nid, attrs in clip.G.node.items()}
        g.adj = {nid: {v: {} for v in clip.G.neighbors(nid)} for nid in clip.G.node}
        cg = ClipGraph()
        cg.video = clip.video
        cg.G = g
        cg.situation = "s"
        cg.scene_label = "sc"
        cg.description = "d"
        mg = MovieGraph()
        mg.imdb_key = "tt0108160"
        mg.clip_graphs = {0: cg}
        path = tmp_path / "mg3.pkl"
        with open(path, "wb") as f:
            pickle.dump({"tt0108160": mg}, f)
    finally:
        for name in ("GraphClasses", "networkx", "networkx.classes.digraph"):
            sys.modules.pop(name, None)

    loaded = graphs.load_mg_pickle(str(path))
    lclip = loaded["tt0108160"].clip_graphs[0]
    assert lclip.video["movie"] == "tt0108160"
    assert set(lclip.G.node) == set(clip.G.node)
    for nid in clip.G.node:
        assert sorted(lclip.G.neighbors(nid)) == sorted(clip.G.neighbors(nid))


def test_mining(synth_cfg):
    result = annotations.mine_interactions(
        synth_cfg.paths,
        movie_idxs=["tt0108160", "tt0120338"],
        inter_class="all",
        with_rels=True,
    )
    assert result.interactions, "no interactions mined"
    assert result.rels_list[-1] == "None"
    for sample in result.interactions:
        assert sample.time_node is not None
        assert sample.triplets, "every interaction has at least one hypothesis"
        assert sample.id is not None
        # every participant has a (possibly empty) track list
        for name in sample.id2names.values():
            assert name in sample.ftracks
        for triplet in sample.triplets.values():
            assert len(triplet) in (1, 2)
            for name in triplet.values():
                assert name in sample.name2id
    # relationship histories include opposite-direction entries
    for movie_rels in result.rels.values():
        for (n1, n2), hist in movie_rels.items():
            assert (n2, n1) in movie_rels


def test_relationship_history_semantics():
    hist = annotations.RelationshipHistory("friend", 2)
    hist.append_scene(None, 5)  # carries current label
    assert hist.scene_labels(5) == ["friend"]
    hist.append_scene("boss", 7)
    assert hist.rels_name == "boss"
    assert hist.scene_labels(7) == ["boss"]
    # re-adding same (scene, label) is a no-op
    hist.append_scene("boss", 7)
    assert hist.scene_labels(7) == ["boss"]
    rng = np.random.default_rng(0)
    assert hist.scene2rel(2, rng) == "friend"
    assert hist.scene2rel(99, rng) == "None"


def test_mining_deterministic(synth_cfg):
    a = annotations.mine_interactions(
        synth_cfg.paths, movie_idxs=["tt0108160"], with_rels=True
    )
    b = annotations.mine_interactions(
        synth_cfg.paths, movie_idxs=["tt0108160"], with_rels=True
    )
    assert len(a.interactions) == len(b.interactions)
    for sa, sb in zip(a.interactions, b.interactions):
        assert sa.inter_node["name"] == sb.inter_node["name"]
        assert sa.triplets == sb.triplets
        assert sa.bi == sb.bi


# -- tt0119822 scene-006 time-node data fix (ref util_functions.py:103-106) -


def _tt0119822_clip_json(movie, fname, t_start):
    return {
        "situation": "s", "scene": "sc", "sentence_description": "d",
        "video": ["m/%s/%s" % (movie, fname)],
        "nodes": [
            {"id": 0, "type": "entity", "name": "ann"},
            {"id": 1, "type": "entity", "name": "bob"},
            {"id": 2, "type": "interaction", "name": "argues with"},
            {"id": 3, "type": "time", "name": "t",
             "t_start": t_start, "t_end": t_start + 3},
        ],
        "edges": [
            {"source": 0, "target": 2}, {"source": 2, "target": 1},
            {"source": 2, "target": 3},
        ],
    }


@pytest.mark.parametrize("movie,fname,t_start,fixed", [
    # the broken annotation: start==9 in THAT clip of THAT movie
    ("tt0119822", "scene-006.ss-0045.es-0048.mp4", 9, True),
    # same clip, different start: untouched
    ("tt0119822", "scene-006.ss-0045.es-0048.mp4", 7, False),
    # same movie, different scene: untouched
    ("tt0119822", "scene-007.ss-0050.es-0060.mp4", 9, False),
    # different movie, same everything else: untouched
    ("tt0108160", "scene-006.ss-0045.es-0048.mp4", 9, False),
])
def test_tt0119822_time_node_fix(movie, fname, t_start, fixed):
    clip = graphs.ClipGraph(_tt0119822_clip_json(movie, fname, t_start))
    sample = annotations.InteractionSample(clip, 2)
    if fixed:
        assert sample.time_node == {"start": 8, "end": 9, "type": "time"}
    else:
        assert sample.time_node["start"] == t_start
        assert sample.time_node["end"] == t_start + 3


def test_tt0119822_fix_golden_vs_reference():
    """The reference's AnnotatedInter applies the identical fix on the same
    clip graph (our ClipGraph is interface-compatible with its G access)."""
    from tests import reference_bridge as bridge

    if not bridge.reference_available():
        pytest.skip("/root/reference not mounted")
    ref = bridge.import_reference()

    for t_start, fixed in ((9, True), (7, False)):
        clip = graphs.ClipGraph(_tt0119822_clip_json(
            "tt0119822", "scene-006.ss-0045.es-0048.mp4", t_start
        ))
        theirs = ref.utils.AnnotatedInter(clip, 2)
        ours = annotations.InteractionSample(clip, 2)
        assert ours.time_node["start"] == theirs.time_node["start"]
        assert ours.time_node["end"] == theirs.time_node["end"]
        assert (ours.time_node["start"] == 8) == fixed
