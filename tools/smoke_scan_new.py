"""Ad-hoc smoke for the new querydb ports (batch: ghidra/php/android/kotlin).

Builds a CPG over ONLY the new fixtures + manifests and runs just the new
queries, printing (name -> [(doc, code)]). Not part of the test suite.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from joern_spark import corpus as C
from joern_spark.corpus import docs_df, split_code_spans
from joern_spark.pipeline import run_pipeline
from joern_spark.scan import DEFAULT_BUNDLE, run_scan
from joern_spark.session import get_spark

NEW = [
    ("fixtures/c/envcopy", C.F30_GETENV_C),
    ("fixtures/js/phpish.js", C.F31_PHPISH_JS),
    ("fixtures/java/RootCheck.java", C.F32_ROOT_JAVA),
    ("fixtures/android/backup/AndroidManifest.xml", C.F33_MANIFEST_BACKUP),
    ("fixtures/android/nobackup/AndroidManifest.xml", C.F34_MANIFEST_OK),
    ("fixtures/android/tap/build.gradle", C.F35_GRADLE_TAP),
    ("fixtures/java/Rng.java", C.F36_PRNG_JAVA),
    ("fixtures/android/attack/AndroidManifest.xml", C.F37_MANIFEST_ATTACK),
    ("fixtures/java/FwdActivity.java", C.F38_INTENT_JAVA),
    ("fixtures/java/EvilReceiver.java", C.F39_RECEIVER_JAVA),
    ("fixtures/java/Dyn.java", C.F40_DEX_JAVA),
    ("fixtures/java/WebHost.java", C.F41_WEBVIEW_JAVA),
    ("fixtures/java/Unzip.java", C.F42_UNZIP_JAVA),
    ("fixtures/java/Trustmgr.java", C.F43_TRUSTMGR_JAVA),
    ("fixtures/java/Redirector.java", C.F44_REDIRECT_JAVA),
]

NEW_NAMES = {
    "call-to-strcpy-ghidra", "getenv-to-strcpy", "php-sql-injection",
    "shell-exec", "root-detection-via-file-checks", "manifest-backup-enabled",
    "tap-jacking", "vuln-prng-android-v16_18", "intent-redirection",
    "unzip-directory-traversal", "usage-of-nop-trust-manager",
    "broadcast-to-file-write", "intent-to-runtime-exec",
    "external-storage-to-dex-classloader", "insecure-load-url-to-exec",
}


def main() -> None:
    spark = get_spark(app_name="smoke_scan_new", cpus=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = [{"doc_id": d, "spans": split_code_spans(t, 2)} for d, t in NEW]
    res = run_pipeline(spark, docs_df(spark, docs), n_parts=4)
    bundle = [q for q in DEFAULT_BUNDLE if q.name in NEW_NAMES]
    rows = run_scan(res.nodes, res.edges, bundle=bundle).collect()
    by = {}
    for r in rows:
        by.setdefault(r["name"], []).append((r["doc_id"], r["code"]))
    for name in sorted(NEW_NAMES):
        print(f"{name}: {sorted(by.get(name, []))}")


if __name__ == "__main__":
    main()
