"""RTPLAN ingestion (read/rtplan.py + structure/plan.py) — NEW; the
reference's modality list stops at RTDOSE and drops plan files."""

import numpy as np
import pytest

import medicalimageanalysis_tpu as mia
from medicalimageanalysis_tpu.data import Data
from medicalimageanalysis_tpu.dicom import (Dataset, Sequence, dcmwrite,
                                            generate_uid, uids)


def write_rtplan_file(path, n_fractions=30, prescription=60.0,
                      dose_sop=None, modality="RTPLAN"):
    ds = Dataset()
    ds.SOPClassUID = uids.RTPlanStorage
    ds.SOPInstanceUID = generate_uid()
    ds.SeriesInstanceUID = generate_uid()
    ds.StudyInstanceUID = generate_uid()
    ds.Modality = modality
    ds.PatientID = "MRN001"
    ds.PatientName = "Plan^Test"
    ds.SeriesDate = "20240102"
    ds.SeriesTime = "101500"
    ds.PatientBirthDate = "19500101"
    ds.RTPlanLabel = "ProstateVMAT"
    ds.RTPlanName = "Prostate 60/30"
    ds.ApprovalStatus = "APPROVED"

    dr = Dataset()
    dr.DoseReferenceNumber = 1
    dr.DoseReferenceStructureType = "SITE"
    dr.DoseReferenceType = "TARGET"
    dr.DoseReferenceDescription = "PTV"
    dr.TargetPrescriptionDose = prescription
    ds.DoseReferenceSequence = Sequence([dr])

    rb1 = Dataset()
    rb1.ReferencedBeamNumber = 1
    rb1.BeamDose = 1.0
    rb1.BeamMeterset = 250.0
    rb2 = Dataset()
    rb2.ReferencedBeamNumber = 2
    rb2.BeamDose = 1.0
    rb2.BeamMeterset = 230.0
    fg = Dataset()
    fg.FractionGroupNumber = 1
    fg.NumberOfFractionsPlanned = n_fractions
    fg.NumberOfBeams = 2
    fg.ReferencedBeamSequence = Sequence([rb1, rb2])
    ds.FractionGroupSequence = Sequence([fg])

    beams = []
    for num, (name, gantry) in enumerate(
            [("CW Arc", 181.0), ("CCW Arc", 179.0)], start=1):
        cp = Dataset()
        cp.ControlPointIndex = 0
        cp.NominalBeamEnergy = 6.0
        cp.GantryAngle = gantry
        cp.BeamLimitingDeviceAngle = 30.0
        cp.PatientSupportAngle = 0.0
        cp.IsocenterPosition = [1.5, -200.0, 75.0]
        b = Dataset()
        b.BeamNumber = num
        b.BeamName = name
        b.BeamType = "DYNAMIC"
        b.RadiationType = "PHOTON"
        b.TreatmentMachineName = "TrueBeam1"
        b.TreatmentDeliveryType = "TREATMENT"
        b.NumberOfControlPoints = 178
        b.FinalCumulativeMetersetWeight = 1.0
        b.ControlPointSequence = Sequence([cp])
        beams.append(b)
    ds.BeamSequence = Sequence(beams)

    if dose_sop is not None:
        rd = Dataset()
        rd.ReferencedSOPClassUID = uids.RTDoseStorage
        rd.ReferencedSOPInstanceUID = dose_sop
        ds.ReferencedDoseSequence = Sequence([rd])
    rs = Dataset()
    rs.ReferencedSOPClassUID = uids.RTStructureSetStorage
    rs.ReferencedSOPInstanceUID = generate_uid()
    ds.ReferencedStructureSetSequence = Sequence([rs])

    dcmwrite(path, ds)
    return str(ds.SOPInstanceUID)


def test_rtplan_ingest(tmp_path):
    Data.clear()
    write_rtplan_file(tmp_path / "rp.dcm")
    report = mia.read_dicoms(folder_path=str(tmp_path)).report
    assert Data.plan_list == ["RTPLAN 01"]
    assert report.plans_created == ["RTPLAN 01"]
    plan = Data.plan["RTPLAN 01"]
    assert plan.label == "ProstateVMAT"
    assert plan.n_fractions == 30
    assert plan.target_prescription_dose == pytest.approx(60.0)
    assert plan.approval_status == "APPROVED"
    assert plan.mrn == "MRN001"
    assert len(plan.beams) == 2
    b = plan.beams[0]
    assert b["name"] == "CW Arc" and b["radiation"] == "PHOTON"
    assert b["machine"] == "TrueBeam1"
    assert b["gantry_angle"] == pytest.approx(181.0)
    assert b["isocenter"] == pytest.approx([1.5, -200.0, 75.0])
    assert plan.total_beam_meterset() == pytest.approx(480.0)
    assert plan.referenced_structure_set_sop
    s = plan.summary()
    assert s["n_fractions"] == 30 and s["beams"] == 2
    Data.clear()


def test_rtplan_links_to_dose(tmp_path):
    """Plan <-> dose linking both directions: plan's ReferencedDose
    SOP, and RTDOSE's ReferencedRTPlanSequence pointing back."""
    from test_deformable_dose import write_rtdose_file
    from helpers import write_ct_series

    Data.clear()
    rng = np.random.default_rng(0)
    arr = rng.integers(-500, 500, size=(4, 16, 16)).astype(np.int16)
    info = write_ct_series(tmp_path, arr, spacing=(1, 1), thickness=2.0)
    dose_raw = np.full((4, 16, 16), 20000, np.uint32)
    write_rtdose_file(tmp_path / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))
    dose_sop = Data.dose["RTDOSE 01"].sops[0]

    write_rtplan_file(tmp_path / "rp.dcm", n_fractions=25,
                      dose_sop=dose_sop)
    mia.read_dicoms(folder_path=str(tmp_path / "rp.dcm"),
                    file_list=[str(tmp_path / "rp.dcm")], clear=False)
    plan = Data.plan["RTPLAN 01"]
    assert plan.linked_dose_names() == ["RTDOSE 01"]

    # fractionation feeds EQD2 directly
    eq = Data.dose["RTDOSE 01"].compute_eqd2(
        plan.n_fractions, alpha_beta=3.0, register=False)
    d = 20.0 / 25.0
    np.testing.assert_allclose(
        eq[0, 0, 0], 20.0 * (d + 3.0) / (2.0 + 3.0), rtol=1e-5)
    Data.clear()


def test_rtplan_minimal_and_degenerate(tmp_path):
    """A plan with nothing but Modality+SOP parses to None fields
    (tolerant-ingest contract)."""
    Data.clear()
    ds = Dataset()
    ds.SOPClassUID = uids.RTPlanStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTPLAN"
    dcmwrite(tmp_path / "rp_min.dcm", ds)
    mia.read_dicoms(folder_path=str(tmp_path))
    plan = Data.plan["RTPLAN 01"]
    assert plan.n_fractions is None
    assert plan.target_prescription_dose is None
    assert plan.beams == [] and plan.fraction_groups == []
    assert plan.total_beam_meterset() is None
    assert plan.linked_dose_names() == []
    Data.clear()


def test_rtplan_respects_only_modality(tmp_path):
    Data.clear()
    write_rtplan_file(tmp_path / "rp.dcm")
    mia.read_dicoms(folder_path=str(tmp_path), only_modality=["CT"])
    assert Data.plan_list == []
    Data.clear()


def test_rtplan_writer_round_trip(tmp_path):
    """Plan.create_rtplan re-exports the harvested summary; a fresh
    ingest reproduces every reader field."""
    Data.clear()
    write_rtplan_file(tmp_path / "rp.dcm")
    mia.read_dicoms(folder_path=str(tmp_path))
    plan = Data.plan["RTPLAN 01"]

    out = tmp_path / "export"
    out.mkdir()
    plan.create_rtplan(path=out / "rp2.dcm")

    Data.clear()
    mia.read_dicoms(folder_path=str(out))
    p2 = Data.plan["RTPLAN 01"]
    assert p2.label == plan.label and p2.name == plan.name
    assert p2.n_fractions == plan.n_fractions
    assert p2.target_prescription_dose == \
        pytest.approx(plan.target_prescription_dose)
    assert p2.approval_status == plan.approval_status
    # summary export: NumberOfControlPoints is rewritten to the
    # serialized CP count (1) per PS3.3 C.8.8.14
    want_beams = [dict(b, n_control_points=1) for b in plan.beams]
    assert p2.beams == want_beams
    assert p2.fraction_groups == plan.fraction_groups
    assert p2.dose_references == plan.dose_references
    assert p2.referenced_structure_set_sop == \
        plan.referenced_structure_set_sop
    assert p2.total_beam_meterset() == \
        pytest.approx(plan.total_beam_meterset())
    Data.clear()


def test_rtplan_ion_beams(tmp_path):
    """RT Ion Plans carry IonBeamSequence + IonControlPointSequence;
    the reader harvests the same geometry and the writer round-trips
    under the ion SOP class (never photon BeamSequence)."""
    Data.clear()
    ds = Dataset()
    ds.SOPClassUID = uids.RTIonPlanStorage
    ds.SOPInstanceUID = generate_uid()
    ds.Modality = "RTPLAN"
    ds.RTPlanLabel = "ProtonPBS"
    cp = Dataset()
    cp.ControlPointIndex = 0
    cp.NominalBeamEnergy = 120.0
    cp.GantryAngle = 90.0
    cp.IsocenterPosition = [0.0, -150.0, 30.0]
    b = Dataset()
    b.BeamNumber = 1
    b.BeamName = "Field1"
    b.RadiationType = "PROTON"
    b.NumberOfControlPoints = 40
    b.IonControlPointSequence = Sequence([cp])
    ds.IonBeamSequence = Sequence([b])
    dcmwrite(tmp_path / "ionplan.dcm", ds)

    mia.read_dicoms(folder_path=str(tmp_path))
    plan = Data.plan["RTPLAN 01"]
    assert len(plan.beams) == 1
    assert plan.beams[0]["radiation"] == "PROTON"
    assert plan.beams[0]["energy"] == pytest.approx(120.0)
    assert plan.beams[0]["gantry_angle"] == pytest.approx(90.0)
    assert plan.beams[0]["isocenter"] == pytest.approx([0.0, -150.0, 30.0])
    # geometry keys uniformly present even for CP-less beams
    assert set(plan.beams[0]) >= {"energy", "gantry_angle",
                                  "collimator_angle", "couch_angle",
                                  "isocenter"}

    out = plan.create_rtplan(path=tmp_path / "ion_out.dcm")
    assert str(out.SOPClassUID) == uids.RTIonPlanStorage
    assert "IonBeamSequence" in out and "BeamSequence" not in out
    assert out.IonBeamSequence[0].NumberOfControlPoints == 1

    Data.clear()
    mia.read_dicoms(file_list=[str(tmp_path / "ion_out.dcm")])
    p2 = Data.plan["RTPLAN 01"]
    assert p2.beams[0]["energy"] == pytest.approx(120.0)
    Data.clear()


def test_isodose_percent_defaults():
    """percent_of with default levels uses percent deciles (not Gy
    deciles reinterpreted as percents); zero grids return {}."""
    import sys
    sys.path.insert(0, "tests")
    from test_radiobiology import _mk_dose
    zz, yy, xx = np.mgrid[0:2, 0:16, 0:16]
    arr = np.maximum(
        60.0 * (1 - np.sqrt((yy - 8.0) ** 2 + (xx - 8.0) ** 2) / 7.0),
        0.0).astype(np.float32)
    d = _mk_dose(arr)
    iso = d.compute_isodose_contours(percent_of=60.0)
    assert sorted(iso) == [6.0 * k for k in range(1, 10)]
    zero = _mk_dose(np.zeros((2, 8, 8), np.float32))
    assert zero.compute_isodose_contours() == {}


def test_batch_mode_validation():
    from medicalimageanalysis_tpu.models.rigid_intensity import (
        register_rigid_intensity_batch)
    refs = np.zeros((2, 4, 8, 8), np.float32)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4))
    ctrs = np.zeros((2, 3), np.float32)
    with pytest.raises(ValueError, match="unknown mode"):
        register_rigid_intensity_batch(refs, refs, eye, eye, ctrs,
                                       mode="afine")
    with pytest.raises(ValueError, match="poses0"):
        register_rigid_intensity_batch(refs, refs, eye, eye, ctrs,
                                       poses0=np.zeros((2, 6)),
                                       mode="affine")


def test_create_reg_matrix_typing(tmp_path):
    """REG export types the matrix per PS3.3 C.20.2: RIGID only for
    orthonormal blocks, RIGID_SCALE for uniform scale, else AFFINE."""
    from helpers import write_ct_series
    Data.clear()
    rng = np.random.default_rng(1)
    arr = rng.integers(-200, 200, size=(4, 12, 12)).astype(np.int16)
    write_ct_series(tmp_path / "a", arr, spacing=(1, 1), thickness=2.0)
    write_ct_series(tmp_path / "b", arr, spacing=(1, 1), thickness=2.0,
                    modality="MR")
    mia.read_dicoms(folder_path=str(tmp_path))
    mr = [n for n in Data.image_list
          if Data.image[n].modality == "MR"][0]

    def mat_type(rigid):
        ds = rigid.create_reg()
        return str(ds.RegistrationSequence[1].MatrixRegistrationSequence[
            0].MatrixSequence[0].FrameOfReferenceTransformationMatrixType)

    rig = mia.Rigid(reference_name="CT 01", moving_name=mr)
    rig.matrix = np.eye(4)
    rig.matrix[:3, 3] = [1.0, 2.0, 3.0]
    assert mat_type(rig) == "RIGID"
    s = np.eye(4)
    s[:3, :3] *= 0.95
    rig.matrix = s
    assert mat_type(rig) == "RIGID_SCALE"
    a = np.eye(4)
    a[0, 1] = 0.1
    rig.matrix = a
    assert mat_type(rig) == "AFFINE"
    Data.clear()


def test_rtplan_byte_flip_fuzz(tmp_path):
    """Byte-flip fuzz of a full RTPLAN (nested sequences) through
    read_dicoms: corruption must never escape the tolerant flow."""
    write_rtplan_file(tmp_path / "rp.dcm")
    good = (tmp_path / "rp.dcm").read_bytes()
    rng = np.random.default_rng(11)
    mut = tmp_path / "mut.dcm"
    for _ in range(120):
        blob = bytearray(good)
        for _ in range(int(rng.integers(1, 16))):
            blob[int(rng.integers(0, len(blob)))] = int(
                rng.integers(0, 256))
        mut.write_bytes(bytes(blob))
        Data.clear()
        mia.read_dicoms(file_list=[str(mut)])  # must not raise
        # whatever registered must expose the full field surface
        for name in Data.plan_list:
            p = Data.plan[name]
            p.summary()
            p.total_beam_meterset()
            p.linked_dose_names()
    Data.clear()


def test_plan_save_load(tmp_path):
    """Plan persistence: json summary round-trips through save_plan /
    load_plan (same documented-schema stance as the other types)."""
    Data.clear()
    write_rtplan_file(tmp_path / "rp.dcm")
    mia.read_dicoms(folder_path=str(tmp_path))
    plan = Data.plan["RTPLAN 01"]
    plan.save_plan(str(tmp_path / "store"))

    Data.clear()
    from medicalimageanalysis_tpu.structure.plan import load_plan
    p2 = load_plan(str(tmp_path / "store" / "RTPLAN 01"))
    assert Data.plan_list == ["RTPLAN 01"]
    assert p2.label == plan.label
    assert p2.n_fractions == 30
    assert p2.beams == plan.beams
    assert p2.fraction_groups == plan.fraction_groups
    assert p2.total_beam_meterset() == pytest.approx(480.0)
    Data.clear()


def test_plan_dose_linkage_survives_save_load(tmp_path):
    """Regression: Dose.save_image persists sops (and load restores
    them), so Plan.linked_dose_names still works after BOTH objects
    round-trip through persistence; date/birthdate no longer revert
    to the '00000'/'' sentinels on load (applied review findings)."""
    from test_deformable_dose import write_rtdose_file
    from helpers import write_ct_series
    from medicalimageanalysis_tpu.structure.dose import Dose
    from medicalimageanalysis_tpu.structure.plan import Plan

    Data.clear()
    rng = np.random.default_rng(3)
    arr = rng.integers(-500, 500, size=(4, 16, 16)).astype(np.int16)
    info = write_ct_series(tmp_path, arr, spacing=(1, 1), thickness=2.0)
    dose_raw = np.full((4, 16, 16), 20000, np.uint32)
    write_rtdose_file(tmp_path / "rd.dcm", dose_raw, info)
    mia.read_dicoms(folder_path=str(tmp_path))
    dose = Data.dose["RTDOSE 01"]
    write_rtplan_file(tmp_path / "rp.dcm", dose_sop=dose.sops[0])
    mia.read_dicoms(file_list=[str(tmp_path / "rp.dcm")], clear=False)
    plan = Data.plan["RTPLAN 01"]
    assert plan.linked_dose_names() == ["RTDOSE 01"]
    plan_date = plan.date

    dose.save_image(str(tmp_path / "store"))
    plan.save_plan(str(tmp_path / "store"))

    Data.clear()
    d2 = Dose.load_image(str(tmp_path / "store" / "RTDOSE 01"))
    p2 = Plan.load_plan(str(tmp_path / "store" / "RTPLAN 01"))
    assert d2.sops == dose.sops
    assert p2.linked_dose_names() == ["RTDOSE 01"]
    # date fallback chain re-derives what save wrote, not '00000'
    assert str(p2.date) == str(plan_date) != "00000"
    Data.clear()
