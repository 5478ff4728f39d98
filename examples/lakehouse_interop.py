"""End-to-end example 4: lakehouse interop — one table, three readers.

    python examples/lakehouse_interop.py [workdir]

Writes a transactional ManifestTable, then makes the SAME data readable
by external Delta and Iceberg tooling with no delta-spark / iceberg
runtime on either side:

1. ManifestTable — two transactional commits (append, then merge)
2. Delta export  — incremental _delta_log commits + a V1 parquet
   checkpoint, read back via the protocol-level Delta reader (time
   travel included)
3. Iceberg export — self-contained snapshots (Avro manifests from the
   pure-Python codec), read back via the Iceberg reader
4. Authenticated extraction wiring — the JWT-bearer (RS256) OAuth2
   provider and an mTLS client context, constructed from stdlib-minted
   credentials, showing the config surface a real deployment fills with
   CA-issued material
"""

from __future__ import annotations

import os
import random
import sys
import tempfile



def run(workdir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from verified_sources_spark.session import get_spark
    from verified_sources_spark.operators.table_format import ManifestTable
    from verified_sources_spark.operators.delta_interop import (
        clean_delta_log,
        export_manifest_as_delta,
        read_delta_table,
        write_delta_checkpoint,
    )
    from verified_sources_spark.operators.iceberg_interop import (
        export_manifest_as_iceberg,
        read_iceberg_table,
    )

    spark = get_spark("lakehouse-interop-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. transactional table, two commits
    t = ManifestTable(spark, os.path.join(workdir, "events"), partition_by=["day"])
    t.append(spark.createDataFrame(
        [("2024-01-01", 1, "signup"), ("2024-01-01", 2, "click"),
         ("2024-01-02", 3, "click")],
        "day string, user_id long, kind string"))
    t.merge(
        spark.createDataFrame(
            [("2024-01-02", 3, "purchase"), ("2024-01-03", 4, "signup")],
            "day string, user_id long, kind string"),
        keys=["user_id"])
    print(f"manifest table: {t.read().count()} rows, version {t.latest_version()}")

    # 2. Delta: two incremental commits + checkpoint, read back
    export_manifest_as_delta(t)
    cp = write_delta_checkpoint(spark, t.path)
    print(f"delta checkpoint: {os.path.basename(cp)}")
    removed = clean_delta_log(spark, t.path)  # retention: checkpoint covers them
    delta_now = read_delta_table(spark, t.path)
    print(f"delta reader sees {delta_now.count()} rows "
          f"(after cleaning commits {removed}):")
    delta_now.orderBy("user_id").show()

    # 3. Iceberg: self-contained snapshot, read back (+ time travel)
    export_manifest_as_iceberg(t)
    ice = read_iceberg_table(spark, t.path)
    print(f"iceberg reader sees {ice.count()} rows (kinds: "
          f"{sorted(r[0] for r in ice.select('kind').distinct().collect())})")

    # 4. authenticated-extraction wiring (stdlib-minted credentials; a
    # real deployment supplies provider-issued key/cert material)
    from verified_sources_spark.sources.oauth import JwtBearerProvider
    from verified_sources_spark.sources.rsa_jwt import (
        generate_rsa_key, private_key_to_pem, jwt_decode_unverified,
        rs256_verify,
    )
    from verified_sources_spark.sources.tls import client_context, self_signed_cert

    key = generate_rsa_key(2048, rng=random.Random(7))

    def offline_token_endpoint(url, form):
        _, claims, signing_input, sig = jwt_decode_unverified(form["assertion"])
        assert rs256_verify(signing_input, sig, key.public())
        return 200, {"access_token": "demo-token", "expires_in": 3600}

    prov = JwtBearerProvider(
        "https://oauth2.example/token", issuer="svc@example.iam",
        private_key_pem=private_key_to_pem(key),
        scope="https://api.example/readonly",
        post=offline_token_endpoint)
    print(f"jwt-bearer grant -> Authorization: {prov.authorization()}")

    crt = os.path.join(workdir, "client.crt")
    with open(crt, "w") as f:
        f.write(self_signed_cert(key, "pipeline-client"))
    with open(os.path.join(workdir, "client.key"), "w") as f:
        f.write(private_key_to_pem(key))
    ctx = client_context(cafile=crt, certfile=crt,
                         keyfile=os.path.join(workdir, "client.key"),
                         check_hostname=False)
    print(f"mTLS context ready (verify_mode={ctx.verify_mode.name}) — "
          "pass as tls= to the Kafka/walsender wire clients")

    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="vss_example_"))
