"""S10: REST API acquisition source (the BOL / CPX company-data API).

Reference lifecycle (BolApiController.php:92-128 + helpers :92-130):

1. ``login`` — form-POST ``grant_type=password`` → ``access_token`` +
   ``token_type`` (:93-115),
2. ``getdata`` — form-POST the registration query with the
   ``Authorization: <type> <token>`` header (:40-57),
3. archive the RAW response verbatim (bronze layer, BolApiRaw :62-65),
4. unwrap ``searchResults`` (:67-71) for the transform side
   (``pipelines.bol_sync``),
5. ``logout`` best-effort, never failing the fetch (:75-77,:117-130).

Engine shape: acquisition is request-per-company, so the client is
driver-side for single fetches and ``fetch_results_distributed`` fans
out over a DataFrame of registration numbers with one login per
PARTITION (not per row — token reuse is the rate-limit-friendly
shape; size partitions to the API's allowed concurrency). The HTTP
``transport`` is injectable — tests and air-gapped containers pass a
fake; the default uses stdlib urllib, no third-party dependency.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# transport contract: (url, form_fields, headers) -> decoded JSON dict
Transport = Callable[[str, dict, dict], dict]


def urllib_transport(url: str, form: dict, headers: dict) -> dict:
    """Default stdlib transport: form-encoded POST, JSON response."""
    data = urllib.parse.urlencode(form).encode("utf-8")
    req = urllib.request.Request(
        url, data=data, headers={"Accept": "application/json", **headers}
    )
    with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


@dataclass
class BolApiConfig:
    """Endpoint + credential bundle (the reference reads these from
    env: CPX_LOGIN_API / CPX_GETDATA_API / CPX_LOGOUT_API /
    CPX_USERNAME / CPX_PASSWORD / CPX_COLUMN_CODE / CPX_LANGUAGE)."""

    login_url: str
    getdata_url: str
    logout_url: str
    username: str
    password: str
    data_field: str = ""
    language: str = "TH"
    extra_payload: dict = field(default_factory=dict)


class BolApiClient:
    """Login → fetch → logout against the BOL API, transport-injected."""

    def __init__(self, config: BolApiConfig, transport: Transport | None = None):
        self.config = config
        self.transport = transport or urllib_transport
        self._token: str | None = None
        self._token_type: str = "Bearer"

    def login(self) -> None:
        """:93-115 — form grant; missing access_token is an error."""
        resp = self.transport(
            self.config.login_url,
            {
                "grant_type": "password",
                "username": self.config.username,
                "password": self.config.password,
                "language": self.config.language,
            },
            {},
        )
        token = resp.get("access_token")
        if not token:
            raise RuntimeError("Login failed: no access_token.")
        self._token = token
        self._token_type = resp.get("token_type", "Bearer")

    def fetch(self, registration_no: str) -> tuple[str, list[dict]]:
        """:40-71 — getdata for one company. Returns (raw_json_text,
        searchResults list; empty when the API found nothing)."""
        if self._token is None:
            self.login()
        payload = {
            "registrationId": registration_no,
            "status": "1",
            "dataSet": "",
            "dataField": self.config.data_field,
            "periodFrom": "0",
            "periodTo": "0",
            "fsType": "2",
            "language": self.config.language,
            **self.config.extra_payload,
        }
        resp = self.transport(
            self.config.getdata_url,
            payload,
            {"Authorization": f"{self._token_type} {self._token}"},
        )
        raw = json.dumps(resp, ensure_ascii=False)
        results = resp.get("searchResults") or []
        return raw, results if isinstance(results, list) else []

    def logout(self) -> None:
        """:117-130 — best-effort session clear; never raises."""
        try:
            self.transport(
                self.config.logout_url,
                {
                    "userName": self.config.username,
                    "password": self.config.password,
                    "language": self.config.language,
                },
                {},
            )
        except Exception:
            pass


RAW_ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("registration_no", T.StringType(), False),
        T.StructField("raw_json", T.StringType(), True),
        T.StructField("n_results", T.IntegerType(), True),
    ]
)


def fetch_raw_archive(
    spark: SparkSession,
    registration_nos: list[str],
    config: BolApiConfig,
    transport: Transport | None = None,
) -> DataFrame:
    """Driver-side fetch for a FEW companies → bronze raw-payload
    frame (registration_no, raw_json, n_results). One login, token
    reused, logout at the end — the controller's lifecycle."""
    client = BolApiClient(config, transport)
    rows = []
    try:
        for reg in registration_nos:
            raw, results = client.fetch(reg)
            rows.append((reg, raw, len(results)))
    finally:
        client.logout()
    return spark.createDataFrame(rows, RAW_ARCHIVE_SCHEMA)


def fetch_raw_archive_distributed(
    regs: DataFrame,
    config: BolApiConfig,
    transport: Transport | None = None,
    reg_col: str = "registration_no",
) -> DataFrame:
    """Scale path: ``regs`` is a DataFrame of registration numbers;
    each PARTITION logs in once, fetches its rows, logs out. Partition
    count bounds API concurrency — ``regs.repartition(k)`` to pick it.
    ``transport`` must be picklable (top-level function) to ship to
    executors."""

    def _run(batches: Iterator) -> Iterator:
        import pandas as pd

        client = BolApiClient(config, transport)
        try:
            for pdf in batches:
                out = []
                for reg in pdf[reg_col]:
                    raw, results = client.fetch(reg)
                    out.append(
                        {
                            "registration_no": reg,
                            "raw_json": raw,
                            "n_results": len(results),
                        }
                    )
                yield pd.DataFrame(
                    out, columns=[f.name for f in RAW_ARCHIVE_SCHEMA]
                )
        finally:
            client.logout()

    return regs.select(F.col(reg_col)).mapInPandas(_run, RAW_ARCHIVE_SCHEMA)


def parse_search_results(raw_archive: DataFrame) -> DataFrame:
    """Bronze → silver: explode ``searchResults`` out of the archived
    raw JSON (schema inferred per batch via from_json over a sampled
    schema is brittle for rank-varying payloads; the transform side in
    ``pipelines.bol_sync`` consumes the exploded string map). One row
    per search result, original registration_no preserved."""
    results = F.from_json(
        F.col("raw_json"),
        T.StructType(
            [
                T.StructField(
                    "searchResults",
                    T.ArrayType(T.MapType(T.StringType(), T.StringType())),
                )
            ]
        ),
    )["searchResults"]
    return raw_archive.select(
        "registration_no", F.explode_outer(results).alias("result")
    )
