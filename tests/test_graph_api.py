"""MovieGraphs query API + relationship-only eval mode."""

import numpy as np
import pytest

from lirec_tpu import config as config_lib
from lirec_tpu.data import graphs, synthetic
from lirec_tpu.data.dataset import InteractionDataset, first_choice


def _clip(synth_cfg):
    movies = graphs.load_graphs(synth_cfg.paths.annotations)
    return next(iter(movies["tt0108160"].clip_graphs.values())), movies


def test_query_api(synth_cfg):
    clip, movies = _clip(synth_cfg)
    names = clip.get_nodes_of_type("entity")
    assert names and all(isinstance(n, str) for n in names)
    tdict = clip.get_node_type_dict()
    assert set(tdict) >= {"entity", "interaction", "time"}
    inter_id = clip.get_node_ids_of_type("interaction")[0]
    neigh = clip.get_neighbors(inter_id, ntypes=["time"])
    assert len(neigh) == 1
    decorated = clip.get_neighbors(inter_id, return_names=True,
                                   return_ntypes=True)
    assert all(len(x) == 3 for x in decorated)
    assert clip.get_characters() == names

    trips = clip.find_all_triplets("interaction", return_names=True)
    assert trips and all(len(t) == 3 for t in trips)
    rel_trips = clip.find_all_triplets("relationship")
    if rel_trips:
        s, mid, t = rel_trips[0]
        assert clip.check_graph_contains_relationship((s, t))
        assert clip.check_graph_contains_relationship(
            (s, t), val=clip.node_name(mid)
        )
        assert not clip.check_graph_contains_relationship((999, 998))

    movie = movies["tt0108160"]
    counts = movie.count_occurrences()
    assert counts["entity"]
    assert movie.characters()


def test_rels_only_eval(synth_root):
    from lirec_tpu.evaluation.runner import evaluate_rels_only
    from lirec_tpu.models.factory import create_model

    base = synthetic.make_config(synth_root)
    cfg = (
        config_lib.preset("int_rels", data_root=synth_root)
        .replace(dims=base.dims, paths=base.paths)
        .with_runtime(compute_dtype="float32")
    )
    ds = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
    ds.cache()
    ds.init_relships()
    bundle = create_model(cfg, ds.n_classes, n_rels=ds.n_rels - 1)
    out = evaluate_rels_only(ds, bundle, bundle.params, cfg, verbose=False)
    assert 0 <= out["rels_top1"] <= out["rels_top3"] <= 1
    assert ds.test_rels_multi_clip is False  # restored


def test_annotation_preprocessing(synth_cfg):
    clip, movies = _clip(synth_cfg)
    movie = movies["tt0108160"]

    # static mining + propagation: inject one 'age' attribute for a
    # character in one clip, then propagate to the others
    eid = clip.get_node_ids_of_type("entity")[0]
    name = clip.node_name(eid)
    nid = clip.new_nodeid()
    clip.G.add_node(nid, name="30", subtype="age", type="attribute",
                    origtext="age:30", pos=(0, 0))
    clip.G.add_edge(eid, nid)
    info = movie.mine_static_info()
    assert (name in info["att"]) and info["att"][name][0][1:] == ("age", "30")
    added = movie.propagate_static_labels()
    assert added >= 1
    for other in movie.clip_graphs.values():
        if name in other.get_characters():
            eids = [e for e in other.get_node_ids_of_type("entity")
                    if other.node_name(e) == name]
            assert other.check_graph_contains_attribute(eids[0], "age", "30")

    # merge groups: labels fold into the largest graph
    sids = list(movie.clip_graphs)
    assert len(sids) >= 2
    sid_clip = {
        s: "videos/tt0108160/" + movie.clip_graphs[s].video["fname"][0]
        for s in sids[:2]
    }
    before = len(movie.clip_graphs)
    stats = movie.merge_clips([tuple(sids[:2])], sid_clip)
    assert stats["more"] == 1
    assert len(movie.clip_graphs) == before - 1

    # cleanup: an empty clip graph gets dropped
    import copy
    empty = copy.deepcopy(next(iter(movie.clip_graphs.values())))
    empty.situation = ""
    empty.G = type(empty.G)()
    movie.clip_graphs[999] = empty
    assert movie.cleanup_empty() == 1


def test_rels_only_eval_maxtracks_preset(synth_root):
    """Regression: rels-only eval must not dispatch to the 4-D maxtracks
    forward for tr_maximize presets."""
    from lirec_tpu.evaluation.runner import evaluate_rels_only
    from lirec_tpu.models.factory import create_model

    base = synthetic.make_config(synth_root)
    cfg = (
        config_lib.preset("int_rel_ch", data_root=synth_root)
        .replace(dims=base.dims, paths=base.paths)
        .with_runtime(compute_dtype="float32")
    )
    ds = InteractionDataset(cfg, mode="val", label_chooser=first_choice)
    ds.cache()
    ds.init_relships()
    bundle = create_model(cfg, ds.n_classes, n_rels=ds.n_rels - 1)
    out = evaluate_rels_only(ds, bundle, bundle.params, cfg, verbose=False)
    assert 0 <= out["rels_top1"] <= 1


def test_topic_and_aux_queries(synth_cfg):
    clip, _ = _clip(synth_cfg)
    inter_id = clip.get_node_ids_of_type("interaction")[0]
    # synthetic clips have no topic nodes; attach one
    tid = clip.new_nodeid()
    clip.G.add_node(tid, name="money", type="topic", origtext="money",
                    pos=(0, 0))
    clip.G.add_edge(inter_id, tid)
    assert clip.get_topic(inter_id) == ["money"]
    assert clip.verify_node_name(tid, "money")
    assert not clip.verify_node_name(tid, "love")
    aux = clip.get_aux_info(ntypes=("time",))
    assert aux and all(isinstance(x, tuple) for x in aux)
    neigh = clip.get_aux_info(inter_id, ntypes=("topic",))
    assert neigh == [(tid, "money")]


# -- authoring/castlist surface (ref GraphClasses.py:21-58,155-174,424-474,
# 572-590; runs when building the pickle, never at train/eval time) --------


def _authoring_clip_json(extra_edges=(), rel2="friend"):
    nodes = [
        {"id": 0, "type": "entity", "name": "Ann", "node_id": 0},
        {"id": 1, "type": "entity", "name": "Bob", "node_id": 1},
        {"id": 2, "type": "entity", "name": "Zed", "node_id": 99},  # unlisted
        {"id": 3, "type": "relationship", "name": "friend"},
        {"id": 4, "type": "attribute", "name": "age:old"},
        {"id": 5, "type": "interaction", "name": "greets"},
        {"id": 6, "type": "relationship", "name": rel2},
        {"id": 7, "type": "relationship", "name": "boss"},
    ]
    edges = [
        {"source": 0, "target": 3}, {"source": 3, "target": 1},
        {"source": 0, "target": 4},  # entity -> attribute (one-way)
        {"source": 0, "target": 5}, {"source": 5, "target": 1},
        {"source": 0, "target": 7}, {"source": 7, "target": 1},
    ] + list(extra_edges)
    return {
        "situation": "meeting", "scene": "office",
        "sentence_description": "Ann greets Bob.",
        "video": ["m/tt0000001/scene-001.ss-0000.es-0010.mp4"],
        "nodes": nodes, "edges": edges,
    }


CASTLIST = [{"chid": "ch1", "name": "Ann X"}, {"chid": "ch2", "name": "Bob Y"}]
VOCAB = {"relationships": [{"values": [
    {"value": "friend", "description": "pals (undirected)"},
    {"value": "boss", "description": "superior (directed)"},
]}]}


def test_relationship_directions_vocab():
    dirs = graphs.get_relationship_directions(VOCAB)
    assert dirs == {"friend": "undirected", "boss": "directed"}


def test_chid_mapping_and_audit(capsys):
    clip = graphs.ClipGraph(_authoring_clip_json())
    clip.add_chid_to_entities(CASTLIST)
    assert clip.G.node[0]["chid"] == "ch1"
    assert clip.G.node[1]["chid"] == "ch2"
    assert clip.G.node[2]["chid"] == "---"  # unlisted character
    rows = clip.check_chid_mappings(CASTLIST)
    assert (0, "Ann", "ch1", ["Ann X"]) in rows
    assert (2, "Zed", "---", []) in rows
    assert "ch1" in capsys.readouterr().out


def test_resolve_edges_attributes_and_directions():
    clip = graphs.ClipGraph(_authoring_clip_json())
    assert not clip.G.has_edge(4, 0)
    clip.resolve_edges(graphs.get_relationship_directions(VOCAB))
    # 1. attribute edge became bidirectional
    assert clip.G.has_edge(4, 0)
    # 4. undirected 'friend' gained the reverse triplet...
    trips = clip.find_all_triplets("relationship")
    assert (0, 3, 1) in trips and (1, 3, 0) in trips
    # ...while directed 'boss' did not
    assert (0, 7, 1) in trips and (1, 7, 0) not in trips


def test_resolve_edges_rejects_undirected_on_directed_rel():
    clip = graphs.ClipGraph(_authoring_clip_json(
        extra_edges=[{"source": 1, "target": 7}, {"source": 7, "target": 0}]
    ))
    with pytest.raises(RuntimeError, match="directed"):
        clip.resolve_edges(graphs.get_relationship_directions(VOCAB))


def test_triplets_collapse_flags_duplicate_mediator():
    # two distinct 'friend' nodes mediating Ann<->Bob in opposite directions
    clip = graphs.ClipGraph(_authoring_clip_json(
        extra_edges=[{"source": 1, "target": 6}, {"source": 6, "target": 0}]
    ))
    with pytest.raises(RuntimeError, match="Unnecessary extra"):
        clip.check_triplets_collapse("relationship")


def test_pprint_counts(capsys):
    clip = graphs.ClipGraph(_authoring_clip_json())
    clip.pprint()
    out = capsys.readouterr().out
    assert "Characters: 3" in out
    assert "Relationships: 3" in out
    assert "Interactions: 1" in out
    assert "Attributes: 1" in out


def test_load_movie_graph_latest_user_wins(tmp_path):
    import json as json_lib
    import os
    import time as time_lib

    u1, u2 = tmp_path / "user1", tmp_path / "user2"
    u1.mkdir(), u2.mkdir()
    old = _authoring_clip_json()
    new = _authoring_clip_json()
    new["situation"] = "updated"
    (u1 / "scene-001.json").write_text(json_lib.dumps(old))
    (u2 / "scene-001.json").write_text(json_lib.dumps(new))
    (u1 / "scene-002.json").write_text(json_lib.dumps(old))
    (u1 / "broken.json").write_text("{not json")
    now = time_lib.time()
    os.utime(u1 / "scene-001.json", (now - 100, now - 100))
    os.utime(u2 / "scene-001.json", (now, now))

    # a third naming form for the SAME scene 2: '2.json' must dedup
    # against 'scene-002.json' (newest mtime wins)
    newer2 = _authoring_clip_json()
    newer2["situation"] = "scene2-updated"
    (u2 / "2.json").write_text(json_lib.dumps(newer2))
    os.utime(u1 / "scene-002.json", (now - 100, now - 100))
    os.utime(u2 / "2.json", (now, now))

    with pytest.warns(UserWarning, match="Failed to load"):
        mg = graphs.load_movie_graph(
            "tt0000001", [str(u1), str(u2)], castlist=CASTLIST
        )
    assert sorted(mg.clip_graphs) == [1, 2]  # normalized numeric scene ids
    assert mg.clip_graphs[1].situation == "updated"  # newest wins
    assert mg.clip_graphs[2].situation == "scene2-updated"  # across forms
    assert mg.clip_graphs[1].G.node[0]["chid"] == "ch1"
    assert mg.castlist == CASTLIST
    mg.attach_information(mergers={"a": 1}, sid_clip={1: "x"})
    assert mg.mergers == {"a": 1} and mg.sid_clip == {1: "x"}


class _SwapChecker:
    """Duck-typed spell checker (``correction(word) -> word``)."""

    def __init__(self, corrections):
        self.corrections = corrections

    def correction(self, word):
        return self.corrections.get(word, word)


def test_fix_spelling(capsys):
    clip = graphs.ClipGraph(_authoring_clip_json())
    clip.situation = "Meeting, at-THE office!"
    clip.fix_spelling(_SwapChecker({"greets": "greet", "office": "bureau"}))
    # lower-cased, punctuation dropped, corrections applied
    assert clip.situation == "meeting at the bureau"
    assert clip.scene_label == "bureau"
    assert clip.G.node[5]["name"] == "greet"   # interaction
    assert clip.G.node[4]["name"] == "old"     # attribute text unchanged
    assert clip.G.node[0]["name"] == "Ann"     # entities untouched
    out = capsys.readouterr().out
    assert "ORI:" in out and "FIX:" in out


def test_fix_spelling_golden_vs_reference(capsys):
    from tests import reference_bridge as bridge

    if not bridge.reference_available():
        pytest.skip("reference not mounted")
    ref = bridge.import_reference()

    def build_pair():
        mine = graphs.ClipGraph(_authoring_clip_json())
        mine.situation = "Meeting, at-THE office!"
        theirs = ref.GraphClasses.ClipGraph.__new__(ref.GraphClasses.ClipGraph)
        theirs.situation = mine.situation
        theirs.scene_label = mine.scene_label
        g = bridge.ShimDiGraph()
        for nid, attrs in mine.G.node.items():
            g.node[nid] = dict(attrs)
            g.adj[nid] = {v: {} for v in mine.G.neighbors(nid)}
        theirs.G = g
        return mine, theirs

    mine, theirs = build_pair()
    checker = _SwapChecker({"greets": "greet", "office": "bureau", "old": "aged"})
    theirs.fix_spelling(checker)
    ref_out = capsys.readouterr().out
    mine.fix_spelling(checker)
    my_out = capsys.readouterr().out

    assert mine.situation == theirs.situation
    assert mine.scene_label == theirs.scene_label
    for nid in mine.G.node:
        assert mine.G.node[nid]["name"] == theirs.G.node[nid]["name"]
    assert my_out == ref_out  # ORI/FIX print order matches too


def _graph_upper_names(ntype):
    def fn(G):
        for n in G.nodes():
            if G.node[n].get("type") == ntype:
                G.node[n]["name"] = G.node[n]["name"].upper()
    return fn


class _FakeLemmatizer:
    def __init__(self):
        self.calls = []
        self.lemmatize_all_interactions = self._wrap(
            "interactions", _graph_upper_names("interaction"))
        self.lemmatize_all_attributes = self._wrap(
            "attributes", _graph_upper_names("attribute"))
        self.lemmatize_all_relationships = self._wrap(
            "relationships", _graph_upper_names("relationship"))

    def _wrap(self, tag, fn):
        def wrapped(G):
            self.calls.append(tag)
            fn(G)
        return wrapped

    def lemmatize_situation(self, s):
        self.calls.append("situation")
        return s + "/lemma"

    def lemmatize_scene(self, s):
        self.calls.append("scene")
        return s + "/lemma"


def test_lemmatize_protocol():
    clip = graphs.ClipGraph(_authoring_clip_json())
    lem = _FakeLemmatizer()
    clip.lemmatize(lem)
    # call order matches ref GraphClasses.py:518-525
    assert lem.calls == [
        "situation", "scene", "interactions", "attributes", "relationships"
    ]
    assert clip.situation == "meeting/lemma"
    assert clip.scene_label == "office/lemma"
    assert clip.G.node[5]["name"] == "GREETS"
    assert clip.G.node[4]["name"] == "OLD"
    assert clip.G.node[3]["name"] == "FRIEND"
    assert clip.G.node[0]["name"] == "Ann"  # entities untouched


def test_lemmatize_without_lemmatizer_matches_reference_failure():
    # the reference's `import lemmatizer` is commented out
    # (GraphClasses.py:18), so its lemmatize() raises NameError
    clip = graphs.ClipGraph(_authoring_clip_json())
    with pytest.raises(NameError):
        clip.lemmatize()
