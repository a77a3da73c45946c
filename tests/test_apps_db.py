"""MetadataDB schema + behavior, incl. opening the reference's real DB."""
import shutil
import sqlite3

from scrfd_arcface_facerecognition_tpu.apps.metadata_db import MetadataDB

QUALITY = {"overall": 0.8, "blur": 0.9, "pose": 0.7, "lighting": 0.85}


def test_schema_tables(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    with sqlite3.connect(db.path) as conn:
        tables = {r[0] for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"persons", "face_quality", "person_visits",
            "low_similarity_images"} <= tables


def test_person_visit_roundtrip(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    pid = db.insert_person("alice", "http://img/1.jpg", 0.8, "hash1", QUALITY)
    assert db.find_person_by_hash("hash1") == pid
    assert db.find_person_by_hash("nope") is None

    db.store_visit(pid, "v1", "c1", "2025-01-01T10:00:00", "http://img/1.jpg",
                   None, 0.9)
    db.store_visit(pid, "v2", "c2", "2025-01-02T10:00:00", "http://img/2.jpg",
                   None, 0.8)
    visits = db.visits_for_person(pid)
    assert len(visits) == 2
    assert visits[0]["visit_id"] == "v2"  # entry_time DESC

    assert db.image_url_seen("http://img/1.jpg")
    assert not db.image_url_seen("http://img/3.jpg")

    db.update_person_stats(pid)
    assert db.get_person(pid)["match_count"] == 1


def test_store_visit_replaces_on_conflict(tmp_path):
    # The reference writes INSERT OR REPLACE (:1664-1668) but its schema
    # has no UNIQUE constraint, so the clause is dead and re-processed
    # visits accumulate duplicate rows. We dedupe on (person_id, visit_id)
    # explicitly — a documented deviation that makes re-runs idempotent.
    db = MetadataDB(str(tmp_path / "t.db"))
    pid = db.insert_person("a", None, 0.5, "h", QUALITY)
    db.store_visit(pid, "v1", "c", "t", "u", None, 0.5)
    db.store_visit(pid, "v1", "c", "t", "u", None, 0.7)
    visits = db.visits_for_person(pid)
    assert len(visits) == 1
    assert visits[0]["similarity"] == 0.7   # latest write wins


def test_low_similarity_and_stats(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    pid = db.insert_person("p", "img", 0.6, "h1", QUALITY)
    db.store_visit(pid, "v1", "c1", "t1", "u1", None, 0.9)
    db.store_low_similarity("v2", "c2", "t2", "u2", None, 0.2, "p", "low sim")
    s = db.stats()
    assert s["total_persons"] == 1
    assert s["total_visits"] == 1
    assert s["low_similarity_count"] == 1
    rows = db.low_similarity_rows()
    assert rows[0]["reason"] == "low sim"


def test_repoint_visits_merge(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    p1 = db.insert_person("a", None, 0.5, "h1", QUALITY)
    p2 = db.insert_person("b", None, 0.5, "h2", QUALITY)
    db.store_visit(p2, "v1", "c", "t", "u", None, 0.9)
    db.update_person_stats(p2)
    db.repoint_visits(p2, p1)
    assert db.get_person(p2) is None
    assert db.visits_for_person(p1)[0]["visit_id"] == "v1"
    assert db.get_person(p1)["match_count"] == 1


def test_person_groups_join(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    p1 = db.insert_person("a", "imgA", 0.5, "h1", QUALITY)
    db.store_visit(p1, "v1", "c1", "t1", "u1", None, 0.9)
    p2 = db.insert_person("b", "imgB", 0.6, "h2", QUALITY)  # no visits
    groups = db.person_groups()
    by_id = {g["person_id"]: g for g in groups}
    assert by_id[p1]["visit_count"] == 1
    assert by_id[p1]["images"][0]["image_url"] == "u1"
    assert by_id[p2]["visit_count"] == 0
    assert by_id[p2]["images"][0]["image_url"] == "imgB"  # fallback main image


def test_clear_all(tmp_path):
    db = MetadataDB(str(tmp_path / "t.db"))
    db.insert_person("a", None, 0.5, "h1", QUALITY)
    db.clear_all()
    assert db.stats()["total_persons"] == 0
    # ids restart from 1 after sqlite_sequence reset
    assert db.insert_person("b", None, 0.5, "h2", QUALITY) == 1


def test_opens_reference_database(tmp_path):
    """The reference's committed face_database.db must open and migrate
    cleanly under our schema manager (golden compatibility fixture)."""
    ref = "/root/reference/face_database.db"
    path = str(tmp_path / "ref.db")
    shutil.copy(ref, path)
    db = MetadataDB(path)
    s = db.stats()
    assert s["total_persons"] > 0
    groups = db.person_groups()
    assert len(groups) == s["total_persons"]
    with sqlite3.connect(path) as conn:
        cols = [r[1] for r in conn.execute("PRAGMA table_info(persons)")]
    assert "embedding" not in cols  # migration applied/upheld
