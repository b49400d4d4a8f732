"""Chinese-Whispers unit tests — planted-cluster recovery (reference induce
fixture style, SURVEY.md §5.1; Biemann 2006)."""

from wsid_ray.cw import chinese_whispers, sense_vectors


def barbell():
    """Two dense 4-cliques joined by one weak bridge edge."""
    a = ["a1", "a2", "a3", "a4"]
    b = ["b1", "b2", "b3", "b4"]
    edges = []
    for grp in (a, b):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((grp[i], grp[j], 1.0))
    edges.append(("a1", "b1", 0.05))
    return a + b, edges


def test_two_planted_clusters_recovered():
    nodes, edges = barbell()
    labels = chinese_whispers(nodes, edges, seed_key="test")
    a_labels = {labels[n] for n in ["a1", "a2", "a3", "a4"]}
    b_labels = {labels[n] for n in ["b1", "b2", "b3", "b4"]}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    assert set(labels.values()) == {0, 1}


def test_deterministic_across_calls():
    nodes, edges = barbell()
    l1 = chinese_whispers(nodes, edges, seed_key="k")
    l2 = chinese_whispers(nodes, edges, seed_key="k")
    assert l1 == l2


def test_label_numbering_by_size_then_min_member():
    # 3-clique and 2-node component: bigger cluster gets label 0
    nodes = ["x", "y", "z", "p", "q"]
    edges = [("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0),
             ("p", "q", 1.0)]
    labels = chinese_whispers(nodes, edges, seed_key="s")
    assert labels["x"] == labels["y"] == labels["z"] == 0
    assert labels["p"] == labels["q"] == 1


def test_sense_vectors_weights_and_topk():
    labels = {"x": 0, "y": 0, "z": 1}
    edges = [("x", "y", 0.5), ("x", "z", 0.9)]  # x-z crosses clusters
    vecs = sense_vectors(labels, edges, top_k=10)
    assert vecs[0] == {"x": 0.5, "y": 0.5}
    assert vecs[1] == {"z": 0.0}  # singleton keeps an entry
    vecs1 = sense_vectors(labels, edges, top_k=1)
    assert len(vecs1[0]) == 1


def test_hyperlex_recovers_planted_clusters():
    """Root-hub variant (Véronis 2004) separates the barbell cliques."""
    from wsid_ray.cw import hyperlex_root_hubs
    nodes, edges = barbell()
    labels = hyperlex_root_hubs(nodes, edges)
    a_labels = {labels[n] for n in ["a1", "a2", "a3", "a4"]}
    b_labels = {labels[n] for n in ["b1", "b2", "b3", "b4"]}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    assert labels == hyperlex_root_hubs(nodes, edges)  # deterministic


def test_hyperlex_flagship_matches_oracle():
    """Engine/oracle parity holds under the alternative induction algo."""
    from wsid_ray.config import PipelineConfig
    from wsid_ray.fixtures import transcript_files
    from wsid_ray.oracle import precision_recall, run_oracle
    from wsid_ray.pipelines.flagship import run_flagship

    cfg = PipelineConfig(induce_algo="hyperlex")
    oracle = run_oracle(transcript_files("tiny"), cfg)
    art = run_flagship("tiny", cfg)
    eng = {(r["subj"], r["pred"], r["obj"]) for r in art.triples.take_all()}
    p, r = precision_recall(eng, oracle["triples"])
    assert p == 1.0 and r == 1.0
    assert oracle["triples"]  # non-degenerate
