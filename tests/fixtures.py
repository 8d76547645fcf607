"""Deterministic raw-log fixture mirroring the reference's synthetic
workload generator (kafka/log_producer.py:18-23,52-64): 4 services with
per-service error rates, a spike regime every 60 s (x10 errors, x3
latency), gaussian latency clamped >= 10.  Seeded for reproducibility —
the reference's implicit test harness, made deterministic (SURVEY §5).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

SERVICES = {
    # service -> (error_rate, base_latency_ms)  (log_producer.py:18-23)
    "auth-service": (0.30, 120),
    "payment-service": (0.02, 300),
    "order-service": (0.015, 180),
    "notification-service": (0.005, 80),
}

T0 = datetime(2024, 1, 1, 0, 0, 0)


def gen_logs(n_seconds: int = 120, seed: int = 42,
             events_per_service_per_sec: int = 8) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    eid = 0
    for s in range(n_seconds):
        spike = (s % 60) < 5  # spike regime (log_producer.py:52-55)
        for service, (err_rate, base_lat) in SERVICES.items():
            for _ in range(events_per_service_per_sec):
                rate = min(1.0, err_rate * 10) if spike else err_rate
                level = "ERROR" if rng.random() < rate else "INFO"
                lat = max(10, int(rng.gauss(base_lat * (3 if spike else 1), 30)))
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(seconds=s, milliseconds=rng.randrange(1000)),
                    "service": service,
                    "is_error": 1 if level == "ERROR" else 0,
                    "latency_ms": float(lat),
                })
                eid += 1
    return rows


LOG_SCHEMA = ("event_id long, ts timestamp, service string, "
              "is_error int, latency_ms double")
