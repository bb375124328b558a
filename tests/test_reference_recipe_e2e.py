"""Switch-over proof: the reference's OWN published source-code
refining recipe (configs/data_juicer_recipes/github_code/
redpajama-code-refine.yaml — the exact payload class of this engine's
north star) must load through `from_yaml` and run end-to-end.

The recipe file is read from the reference checkout at test time (not
copied into the repo). One entry — the second alphanumeric_filter with
tokenization: True — needs the HF tokenizer, and the engine's contract
for that is a LOUD NotImplementedError at construction (never a silent
fallback); the e2e run drops exactly that entry, as a real user of the
hermetic build would.
"""

from __future__ import annotations

import os

import pytest
import yaml

from data_juicer_spark.pipeline import Pipeline, from_yaml

RECIPE = ("/root/reference/configs/data_juicer_recipes/github_code/"
          "redpajama-code-refine.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.exists(RECIPE), reason="reference checkout not present")


def _load_process():
    with open(RECIPE) as fh:
        return yaml.safe_load(fh)["process"]


def test_recipe_model_dep_entry_fails_loudly():
    proc = _load_process()
    tok_entries = [e for e in proc if "alphanumeric_filter" in e
                   and e["alphanumeric_filter"].get("tokenization")]
    assert tok_entries, "recipe changed upstream?"
    with pytest.raises(NotImplementedError):
        Pipeline(tok_entries)


def test_reference_code_recipe_runs_end_to_end(spark):
    proc = [e for e in _load_process()
            if not ("alphanumeric_filter" in e
                    and e["alphanumeric_filter"].get("tokenization"))]
    # every remaining op must construct from the reference's own kwargs
    pipe = Pipeline(proc)
    assert len(pipe.ops) == len(proc)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pipe.apply(docs)
    n_in, n_out = docs.count(), out.count()
    # the recipe is tuned for long code files; synthetic prose mostly
    # fails text_length_filter(min_len=300) — the point is that the
    # whole plan builds and executes, keep-set ⊆ input
    assert 0 <= n_out <= n_in
    assert out.columns[:2] == docs.columns[:2]


def test_reference_recipe_loads_via_from_yaml():
    # from_yaml must digest the reference's FULL config file (global
    # params + process list), not just a bare process list
    proc = _load_process()
    if any("alphanumeric_filter" in e
           and e["alphanumeric_filter"].get("tokenization") for e in proc):
        with pytest.raises(NotImplementedError):
            from_yaml(RECIPE)
    else:  # pragma: no cover - upstream recipe change
        from_yaml(RECIPE)


def test_stack_code_recipe_with_global_text_key(spark):
    """stack-code-refine.yaml carries the reference's global
    text_keys: 'content' — the exact column name of the north-star CDC
    table; from_yaml must thread it into every op."""
    recipe = ("/root/reference/configs/data_juicer_recipes/github_code/"
              "stack-code-refine.yaml")
    if not os.path.exists(recipe):
        pytest.skip("reference checkout not present")
    with open(recipe) as fh:
        cfg = yaml.safe_load(fh)
    cfg["process"] = [e for e in cfg["process"]
                      if not ("alphanumeric_filter" in e
                              and (e["alphanumeric_filter"] or {})
                              .get("tokenization"))]
    pipe = from_yaml(yaml.safe_dump(cfg))
    assert all(op.text_key == "content" for op in pipe.ops)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumnRenamed("text", "content"))
    out = pipe.apply(docs)
    assert 0 <= out.count() <= docs.count()
    assert "content" in out.columns


def test_every_published_recipe_entry_constructs():
    """Sweep EVERY process entry in every yaml under reference
    configs/: any op this engine registers must construct from the
    recipe's own kwargs — either successfully or with the documented
    loud NotImplementedError for model-dep modes. Zero TypeErrors =
    full constructor compatibility with the published recipe corpus."""
    import glob

    from data_juicer_spark.registry import OPERATORS
    import data_juicer_spark.operators  # noqa: F401  (populate registry —
    # the `name not in OPERATORS._ops` probe below never calls .get(),
    # so without this the sweep silently skips everything when the test
    # runs before any other operator-importing test)

    files = sorted(glob.glob("/root/reference/configs/**/*.yaml",
                             recursive=True))
    if not files:
        pytest.skip("reference checkout not present")
    ok = loud = 0
    errors = []
    for f in files:
        try:
            cfg = yaml.safe_load(open(f))
        except Exception:
            continue
        if not isinstance(cfg, dict) \
                or not isinstance(cfg.get("process"), list):
            continue
        for entry in cfg["process"]:
            if not isinstance(entry, dict) or len(entry) != 1:
                continue
            (name, kw), = entry.items()
            if name not in OPERATORS._ops:
                continue  # documented non-goal surface
            try:
                OPERATORS.get(name)(**(kw or {}))
                ok += 1
            except NotImplementedError:
                loud += 1  # documented model-dep mode, loud by design
            except Exception as e:  # noqa: BLE001
                errors.append((f, name, f"{type(e).__name__}: {e}"))
    assert not errors, errors[:5]
    assert ok >= 400, (ok, loud)  # corpus size fence
