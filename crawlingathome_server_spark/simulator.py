"""Pure-Python single-node reference simulator (SURVEY.md §5.1).

Implements exactly the reference server's job state machine
(models.py:6-7), claim semantics (models.py:105-131, with ORDER BY
RANDOM() replaced by the same seeded-hash order the engine uses — the
"same seed list" condition in BASELINE.json), completion transitions
(main.py:627-697 incl. the 'postgres' short-circuit at main.py:650-652),
claim release (main.py:545-552), and the idle reaper (main.py:748-759).

The engine's Spark claim/transition operators must reproduce this
simulator's claim sequence and final state bit-for-bit — that is the
crawl-ordering + URL-seen correctness gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

KNUTH = 2654435761
MOD = 4294967296


def oracle_hash(key: int, seed: int = 0) -> int:
    return (key * KNUTH + seed) % MOD


@dataclass
class SimJob:
    number: int
    url: str
    host: str
    priority: float
    gpu: bool = False
    gpu_url: str | None = None
    pending: bool = False
    closed: bool = False
    completor: str | None = None
    cpu_completor: str | None = None
    claim_epoch: int | None = None


@dataclass
class SimWorker:
    uuid: str
    type: str
    shard_number: int | None = None
    jobs_completed: int = 0
    first_seen: int = 0
    last_seen: int = 0


IDLE_TIMEOUT_S = 7200  # reference config.py:8


@dataclass
class Simulator:
    jobs: dict[int, SimJob] = field(default_factory=dict)
    workers: dict[str, SimWorker] = field(default_factory=dict)
    leaderboard: dict[str, list[int]] = field(default_factory=dict)  # nickname -> [jobs, pairs]
    claim_log: list[tuple[int, int]] = field(default_factory=list)  # (round, number)

    def add_jobs(self, rows):
        seen = set()
        for r in rows:  # first-wins dedup, update_db.py:98-105
            if r.number in seen:
                continue
            seen.add(r.number)
            self.jobs[r.number] = r

    # -- claim round: per-host budgeted top-k by (priority desc, hash) -----

    def claim_round(
        self,
        *,
        seed: int,
        round_epoch: int,
        stage: str = "cpu",
        budgets: dict[str, int] | None = None,
        default_budget: int = 4,
    ) -> list[int]:
        want_gpu = stage == "gpu"
        open_jobs = [
            j
            for j in self.jobs.values()
            if not j.pending and not j.closed and j.gpu == want_gpu
        ]
        by_host: dict[str, list[SimJob]] = {}
        for j in open_jobs:
            by_host.setdefault(j.host, []).append(j)
        claimed: list[int] = []
        for host, js in by_host.items():
            b = (budgets or {}).get(host, default_budget)
            js.sort(key=lambda j: (-j.priority, oracle_hash(j.number, seed), j.number))
            for j in js[:b]:
                j.pending = True
                j.completor = "claimed"
                j.claim_epoch = round_epoch
                claimed.append(j.number)
        claimed.sort()
        for n in claimed:
            self.claim_log.append((round_epoch, n))
        return claimed

    # -- completions (main.py:627-697) -------------------------------------

    def complete(self, number: int, *, kind: str, nickname: str, count: int, gpu_url: str | None = None):
        j = self.jobs.get(number)
        if j is None or j.closed:  # guards main.py:637-640
            return
        if kind == "cpu":  # U3
            if gpu_url is None:  # main.py:642-644 rejects with HTTP 400
                return
            # completor is NOT modified on the CPU path (main.py:646-653
            # leaves the claim-time value), even when the 'postgres'
            # shortcut closes the job.
            j.pending = False
            j.gpu_url = gpu_url
            j.cpu_completor = nickname
            if "postgres" in gpu_url:  # main.py:650-652
                j.closed = True
            else:
                j.gpu = True
        else:  # U2 hybrid/gpu
            j.closed = True
            j.pending = False
            j.completor = nickname
            lb = self.leaderboard.setdefault(nickname, [0, 0])
            lb[0] += 1
            lb[1] += count

    # -- release / revert --------------------------------------------------

    def release(self, number: int):
        j = self.jobs.get(number)
        if j is not None and not j.closed:
            j.pending = False
            j.completor = None

    def gpu_invalid_download(self, number: int):
        j = self.jobs.get(number)
        if j is not None and not j.closed:
            j.gpu = False
            j.gpu_url = None
            j.cpu_completor = None
            j.pending = False

    # -- heartbeat (main.py:620) --------------------------------------------

    def heartbeat(self, uuid: str, epoch: int, progress: str | None = None):
        w = self.workers.get(uuid)
        if w is not None:
            w.last_seen = epoch

    # -- reaper (main.py:748-759) -----------------------------------------

    def reap_idle(self, now_epoch: int) -> int:
        dead = [
            w for w in self.workers.values() if w.last_seen <= now_epoch - IDLE_TIMEOUT_S
        ]
        for w in dead:
            if w.shard_number is not None:
                self.release(w.shard_number)
            del self.workers[w.uuid]
        return len(dead)

    # -- final state views -------------------------------------------------

    def seen_set(self) -> set[int]:
        """URL-seen membership = shards ever claimed or already closed."""
        return {n for _, n in self.claim_log} | {
            n for n, j in self.jobs.items() if j.closed
        }

    def state_tuple(self, number: int):
        j = self.jobs[number]
        return (j.pending, j.closed, j.gpu, j.gpu_url, j.completor, j.cpu_completor)
