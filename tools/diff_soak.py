"""Soak runner for the differential layers: re-run selected layers'
generator+mirror loops with FRESH random seeds and higher trial counts.

The committed tests (tests/test_*_differential.py) are fixed-seed so the
gate is reproducible; this tool probes NEW regions of the input space.
Usage:

    python tools/diff_soak.py [trials-per-layer] [seed]

Any failure (an output DIVERGENCE, or an engine ERROR like the
path{0} raise this tool caught in round 6) prints the layer and the
exact seed so it can be pinned as a fixed-seed regression test; the
remaining layers still run, and the exit code is non-zero if anything
failed.
"""

import importlib.util
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, f"tests/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else int(time.time())
    print(f"soak: {trials} trials/layer, master seed {seed}", flush=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("diff-soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    layers = [
        ("test_graph_differential", "test_random_graph_patterns_match_duckdb"),
        ("test_exists_differential", "test_random_exists_match_duckdb"),
        (
            "test_exists_differential",
            "test_exists_nested_in_boolean_exprs_match_duckdb",
        ),
        ("test_minus_differential", "test_random_minus_match_duckdb"),
        ("test_update_differential", "test_random_update_sequences_match_model"),
        ("test_subquery_differential", "test_random_subqueries_match_duckdb"),
        ("test_construct_differential", "test_random_construct_match_model"),
        (
            "test_path_differential",
            "test_random_nps_and_quantifier_paths_match_duckdb",
        ),
        ("test_path_differential", "test_random_paths_under_graph_match_duckdb"),
        ("test_values_differential", "test_random_values_blocks_match_duckdb"),
        ("test_describe_differential", "test_random_describe_match_model"),
        ("test_bind_differential", "test_random_mid_group_bind_match_duckdb"),
        ("test_rdfs_differential", "test_random_rdfs_closure_matches_rule_fixpoint"),
        ("test_optional_differential", "test_sequential_optionals_match_duckdb"),
        (
            "test_optional_differential",
            "test_filter_scoped_inside_optional_match_duckdb",
        ),
        ("test_order_differential", "test_random_order_by_is_sound_and_lossless"),
    ]
    master = random.Random(seed)
    failures = 0
    for mod_name, fn_name in layers:
        mod = _load(mod_name)
        fn = getattr(mod, fn_name)
        layer_seed = master.randrange(1 << 30)
        t0 = time.time()
        # the tests fix their seed via random.Random(N) literals; rather
        # than parse them, re-seed the module-level `random` import the
        # loops draw every choice from
        orig_random_cls = mod.random.Random
        # scale the loop: run the function repeatedly with fresh seeds
        # until the requested trial budget is covered (each call runs
        # its built-in ~15-25 trials)
        per_call = 20
        calls = max(1, trials // per_call)
        clean = 0
        try:
            for c in range(calls):
                # signature-compatible with random.Random(): the patch is
                # process-global (mod.random IS the stdlib module), so a
                # zero-arg Random() constructed anywhere during the layer
                # run must not raise
                mod.random.Random = (
                    lambda *_a, _s=layer_seed + c: orig_random_cls(_s)
                )
                try:
                    fn(spark)
                    clean += 1
                except AssertionError as e:
                    failures += 1
                    print(
                        f"DIVERGENCE in {mod_name}.{fn_name} "
                        f"(seed {layer_seed + c}): {str(e)[:400]}",
                        flush=True,
                    )
                    break  # move on to the next layer
                except Exception as e:  # engine error, not a divergence
                    failures += 1
                    print(
                        f"ERROR in {mod_name}.{fn_name} "
                        f"(seed {layer_seed + c}): "
                        f"{type(e).__name__}: {str(e)[:400]}",
                        flush=True,
                    )
                    break
        finally:
            mod.random.Random = orig_random_cls
        if clean == calls:
            print(
                f"  {mod_name}.{fn_name}: {calls} call(s) clean "
                f"({time.time() - t0:.1f}s, seed {layer_seed})",
                flush=True,
            )
    if failures:
        print(f"soak FAILED: {failures} layer(s)")
        raise SystemExit(1)
    print("soak clean")


if __name__ == "__main__":
    main()
