"""RT Plan domain object.

BEYOND-PARITY: the reference drops RTPLAN files on the floor (its
modality list stops at RTDOSE, reference reader.py:230-238), yet the
plan carries exactly what dose analytics need — fractionation for
EQD2/BED, prescription for percent-isodose and gamma normalisation,
and the beam geometry for reporting. This object holds the harvested
plan summary and registers into ``Data.plan``; ``linked_dose_names``
ties it to ingested RTDOSE grids via Referenced SOP instances.
"""

from __future__ import annotations

import numpy as np

from ..data import Data
from ..dicom import generate_uid
from .common import MetadataMixin

__all__ = ["Plan"]


class Plan(MetadataMixin):
    """Summary of an RT Plan (or RT Ion Plan) dataset."""

    def __init__(self, plan):
        self.tags = plan.image_set
        self.plan_name = plan.plan_name
        self.modality = plan.modality
        self.filepaths = plan.filepaths
        self.sops = plan.sops

        self.patient_name = self.get_patient_name()
        self.mrn = self.get_mrn()
        self.birthdate = self.get_birthdate()
        self.date = self.get_date()
        self.time = self.get_time()
        self.local_uid = generate_uid()
        self.series_uid = self.get_series_uid()
        self.frame_ref = self.get_frame_ref()

        self.label = plan.label
        self.name = plan.name
        self.description = plan.description
        self.approval_status = plan.approval_status
        self.n_fractions = plan.n_fractions
        self.target_prescription_dose = plan.target_prescription_dose
        self.dose_references = plan.dose_references
        self.fraction_groups = plan.fraction_groups
        self.beams = plan.beams
        self.referenced_structure_set_sop = \
            plan.referenced_structure_set_sop
        self.referenced_dose_sops = plan.referenced_dose_sops
        self.misc = {}

        Data.plan[self.plan_name] = self
        Data.plan_list += [self.plan_name]

    # -- convenience -----------------------------------------------------
    def linked_dose_names(self):
        """Names of ingested Dose grids this plan references (by
        Referenced SOP instance), plus any RTDOSE whose own
        ReferencedRTPlanSequence points back at this plan."""
        mine = set(self.referenced_dose_sops)
        my_sops = set(self.sops)
        out = []
        for name in Data.dose_list:
            dose = Data.dose[name]
            if mine and set(dose.sops) & mine:
                out.append(name)
                continue
            ds = dose.tags[0] if getattr(dose, "tags", None) else None
            if ds is not None and "ReferencedRTPlanSequence" in ds:
                for item in ds.ReferencedRTPlanSequence:
                    if "ReferencedSOPInstanceUID" in item and \
                            str(item.ReferencedSOPInstanceUID) in my_sops:
                        out.append(name)
                        break
        return out

    def total_beam_meterset(self):
        """Sum of ReferencedBeamSequence metersets (MU) over all
        fraction groups; None when absent."""
        total, seen = 0.0, False
        for fg in self.fraction_groups:
            for bd in fg.get("beam_doses", []):
                if bd.get("meterset") is not None:
                    total += float(bd["meterset"])
                    seen = True
        return total if seen else None

    def summary(self):
        return {
            "plan": self.plan_name,
            "label": self.label,
            "n_fractions": self.n_fractions,
            "prescription_gy": self.target_prescription_dose,
            "beams": len(self.beams),
            "approval": self.approval_status,
        }
