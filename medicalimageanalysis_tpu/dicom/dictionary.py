"""Curated DICOM data dictionary.

Own implementation of the tag registry (the reference relies on pydicom's
full dictionary; we carry the subset every code path in this framework —
and the reference's public API surface (reference read/dicom.py,
utils/creation.py) — actually touches, plus common identity/geometry tags).

Each entry: tag (group << 16 | element) -> (VR, keyword).
"""

TAG_DICT = {
    # file meta (group 0002)
    0x00020000: ("UL", "FileMetaInformationGroupLength"),
    0x00020001: ("OB", "FileMetaInformationVersion"),
    0x00020002: ("UI", "MediaStorageSOPClassUID"),
    0x00020003: ("UI", "MediaStorageSOPInstanceUID"),
    0x00020010: ("UI", "TransferSyntaxUID"),
    0x00020012: ("UI", "ImplementationClassUID"),
    0x00020013: ("SH", "ImplementationVersionName"),
    # identification
    0x00080005: ("CS", "SpecificCharacterSet"),
    0x00080008: ("CS", "ImageType"),
    0x00080012: ("DA", "InstanceCreationDate"),
    0x00080013: ("TM", "InstanceCreationTime"),
    0x00080016: ("UI", "SOPClassUID"),
    0x00080018: ("UI", "SOPInstanceUID"),
    0x00080020: ("DA", "StudyDate"),
    0x00080021: ("DA", "SeriesDate"),
    0x00080022: ("DA", "AcquisitionDate"),
    0x00080023: ("DA", "ContentDate"),
    0x00080030: ("TM", "StudyTime"),
    0x00080031: ("TM", "SeriesTime"),
    0x00080032: ("TM", "AcquisitionTime"),
    0x00080033: ("TM", "ContentTime"),
    0x00080050: ("SH", "AccessionNumber"),
    0x00080060: ("CS", "Modality"),
    0x00080070: ("LO", "Manufacturer"),
    0x00080080: ("LO", "InstitutionName"),
    0x00080090: ("PN", "ReferringPhysicianName"),
    0x00081030: ("LO", "StudyDescription"),
    0x0008103E: ("LO", "SeriesDescription"),
    0x00081090: ("LO", "ManufacturerModelName"),
    0x00081140: ("SQ", "ReferencedImageSequence"),
    0x00081150: ("UI", "ReferencedSOPClassUID"),
    0x00081155: ("UI", "ReferencedSOPInstanceUID"),
    0x00081115: ("SQ", "ReferencedSeriesSequence"),
    0x0008114A: ("SQ", "ReferencedInstanceSequence"),
    0x00081200: ("SQ", "StudiesContainingOtherReferencedInstancesSequence"),
    0x00082112: ("SQ", "SourceImageSequence"),
    0x00089215: ("SQ", "DerivationCodeSequence"),
    # patient
    0x00100010: ("PN", "PatientName"),
    0x00100020: ("LO", "PatientID"),
    0x00100030: ("DA", "PatientBirthDate"),
    0x00100040: ("CS", "PatientSex"),
    0x00101010: ("AS", "PatientAge"),
    0x00101030: ("DS", "PatientWeight"),
    0x00102210: ("CS", "AnatomicalOrientationType"),
    # acquisition
    0x00180015: ("CS", "BodyPartExamined"),
    0x00180050: ("DS", "SliceThickness"),
    0x00180060: ("DS", "KVP"),
    0x00180088: ("DS", "SpacingBetweenSlices"),
    0x00181020: ("LO", "SoftwareVersions"),
    0x00181030: ("LO", "ProtocolName"),
    0x00181164: ("DS", "ImagerPixelSpacing"),
    0x00185100: ("CS", "PatientPosition"),
    0x00186011: ("SQ", "SequenceOfUltrasoundRegions"),
    0x00186024: ("US", "PhysicalUnitsXDirection"),
    0x00186026: ("US", "PhysicalUnitsYDirection"),
    0x0018602C: ("FD", "PhysicalDeltaX"),
    0x0018602E: ("FD", "PhysicalDeltaY"),
    0x00187022: ("DS", "DetectorElementSpacing"),
    0x00189313: ("FD", "DataCollectionCenterPatient"),
    # study / series
    0x0020000D: ("UI", "StudyInstanceUID"),
    0x0020000E: ("UI", "SeriesInstanceUID"),
    0x00200010: ("SH", "StudyID"),
    0x00200011: ("IS", "SeriesNumber"),
    0x00200012: ("IS", "AcquisitionNumber"),
    0x00200013: ("IS", "InstanceNumber"),
    0x00200020: ("CS", "PatientOrientation"),
    0x00200032: ("DS", "ImagePositionPatient"),
    0x00200037: ("DS", "ImageOrientationPatient"),
    0x00200052: ("UI", "FrameOfReferenceUID"),
    0x00201040: ("LO", "PositionReferenceIndicator"),
    0x00201041: ("DS", "SliceLocation"),
    0x00209113: ("SQ", "PlanePositionSequence"),
    0x00209116: ("SQ", "PlaneOrientationSequence"),
    # image pixel
    0x00280002: ("US", "SamplesPerPixel"),
    0x00280004: ("CS", "PhotometricInterpretation"),
    0x00280006: ("US", "PlanarConfiguration"),
    0x00280008: ("IS", "NumberOfFrames"),
    0x00280010: ("US", "Rows"),
    0x00280011: ("US", "Columns"),
    0x00280030: ("DS", "PixelSpacing"),
    0x00280100: ("US", "BitsAllocated"),
    0x00280101: ("US", "BitsStored"),
    0x00280102: ("US", "HighBit"),
    0x00280103: ("US", "PixelRepresentation"),
    0x00281050: ("DS", "WindowCenter"),
    0x00281051: ("DS", "WindowWidth"),
    0x00281052: ("DS", "RescaleIntercept"),
    0x00281053: ("DS", "RescaleSlope"),
    0x00281054: ("LO", "RescaleType"),
    # PALETTE COLOR lookup tables (PS3.3 C.7.6.3.1.5 / C.7.9)
    0x00281101: ("US", "RedPaletteColorLookupTableDescriptor"),
    0x00281102: ("US", "GreenPaletteColorLookupTableDescriptor"),
    0x00281103: ("US", "BluePaletteColorLookupTableDescriptor"),
    0x00281201: ("OW", "RedPaletteColorLookupTableData"),
    0x00281202: ("OW", "GreenPaletteColorLookupTableData"),
    0x00281203: ("OW", "BluePaletteColorLookupTableData"),
    0x00281221: ("OW", "SegmentedRedPaletteColorLookupTableData"),
    0x00281222: ("OW", "SegmentedGreenPaletteColorLookupTableData"),
    0x00281223: ("OW", "SegmentedBluePaletteColorLookupTableData"),
    0x00282050: ("SQ", "PresentationLUTSequence"),
    0x20500020: ("CS", "PresentationLUTShape"),
    # code sequences (PS3.3 8.8)
    0x00080100: ("SH", "CodeValue"),
    0x00080102: ("SH", "CodingSchemeDesignator"),
    0x00080104: ("LO", "CodeMeaning"),
    # multi-frame functional groups
    0x52009229: ("SQ", "SharedFunctionalGroupsSequence"),
    0x52009230: ("SQ", "PerFrameFunctionalGroupsSequence"),
    0x00209111: ("SQ", "FrameContentSequence"),
    0x00209157: ("UL", "DimensionIndexValues"),
    0x00209164: ("UI", "DimensionOrganizationUID"),
    0x00209165: ("AT", "DimensionIndexPointer"),
    0x00209167: ("AT", "FunctionalGroupPointer"),
    0x00209221: ("SQ", "DimensionOrganizationSequence"),
    0x00209222: ("SQ", "DimensionIndexSequence"),
    # presentation-state content identification (PS3.3 C.10.9)
    0x00700080: ("CS", "ContentLabel"),
    0x00700081: ("LO", "ContentDescription"),
    0x00700084: ("PN", "ContentCreatorName"),
    # PET series / radiopharmaceutical (PS3.3 C.8.9)
    0x00541000: ("CS", "SeriesType"),
    0x00541001: ("CS", "Units"),
    0x00541102: ("CS", "DecayCorrection"),
    0x00541016: ("SQ", "RadiopharmaceuticalInformationSequence"),
    0x00181072: ("TM", "RadiopharmaceuticalStartTime"),
    0x00181074: ("DS", "RadionuclideTotalDose"),
    0x00181075: ("DS", "RadionuclideHalfLife"),
    0x00181078: ("DT", "RadiopharmaceuticalStartDateTime"),
    0x00289110: ("SQ", "PixelMeasuresSequence"),
    # Segmentation IOD (PS3.3 C.8.20)
    0x00620001: ("CS", "SegmentationType"),
    0x00620002: ("SQ", "SegmentSequence"),
    0x00620003: ("SQ", "SegmentedPropertyCategoryCodeSequence"),
    0x00620004: ("US", "SegmentNumber"),
    0x00620005: ("LO", "SegmentLabel"),
    0x00620006: ("ST", "SegmentDescription"),
    0x00620008: ("CS", "SegmentAlgorithmType"),
    0x00620009: ("LO", "SegmentAlgorithmName"),
    0x0062000A: ("SQ", "SegmentIdentificationSequence"),
    0x0062000B: ("US", "ReferencedSegmentNumber"),
    0x0062000C: ("US", "RecommendedDisplayGrayscaleValue"),
    0x0062000D: ("US", "RecommendedDisplayCIELabValue"),
    0x0062000E: ("US", "MaximumFractionalValue"),
    0x0062000F: ("SQ", "SegmentedPropertyTypeCodeSequence"),
    0x00620010: ("CS", "SegmentationFractionalType"),
    0x00289145: ("SQ", "PixelValueTransformationSequence"),
    0x00189329: ("SQ", "ContributingSourcesSequence"),
    # RTSTRUCT
    0x30060002: ("SH", "StructureSetLabel"),
    0x30060008: ("DA", "StructureSetDate"),
    0x30060009: ("TM", "StructureSetTime"),
    0x30060010: ("SQ", "ReferencedFrameOfReferenceSequence"),
    0x30060012: ("SQ", "RTReferencedStudySequence"),
    0x30060014: ("SQ", "RTReferencedSeriesSequence"),
    0x30060016: ("SQ", "ContourImageSequence"),
    0x30060020: ("SQ", "StructureSetROISequence"),
    0x30060022: ("IS", "ROINumber"),
    0x30060024: ("UI", "ReferencedFrameOfReferenceUID"),
    0x30060026: ("LO", "ROIName"),
    0x30060036: ("CS", "ROIGenerationAlgorithm"),
    0x30060039: ("SQ", "ROIContourSequence"),
    0x3006002A: ("IS", "ROIDisplayColor"),
    0x30060040: ("SQ", "ContourSequence"),
    0x30060042: ("CS", "ContourGeometricType"),
    0x30060046: ("IS", "NumberOfContourPoints"),
    0x30060048: ("IS", "ContourNumber"),
    0x30060050: ("DS", "ContourData"),
    0x30060080: ("SQ", "RTROIObservationsSequence"),
    0x30060082: ("IS", "ObservationNumber"),
    0x30060084: ("IS", "ReferencedROINumber"),
    0x300600A4: ("CS", "RTROIInterpretedType"),
    0x300600B0: ("SQ", "ROIPhysicalPropertiesSequence"),
    # RTDOSE
    0x30040002: ("CS", "DoseUnits"),
    0x30040004: ("CS", "DoseType"),
    0x3004000A: ("CS", "DoseSummationType"),
    0x3004000C: ("DS", "GridFrameOffsetVector"),
    0x3004000E: ("DS", "DoseGridScaling"),
    0x300C0002: ("SQ", "ReferencedRTPlanSequence"),
    # REG (spatial registration)
    0x00700308: ("SQ", "RegistrationSequence"),
    0x00700309: ("SQ", "MatrixRegistrationSequence"),
    0x0070030A: ("SQ", "MatrixSequence"),
    0x0070030C: ("CS", "FrameOfReferenceTransformationMatrixType"),
    0x30060C6: ("DS", "_unused"),
    0x300600C6: ("DS", "FrameOfReferenceTransformationMatrix"),
    0x300600C7: ("LO", "FrameOfReferenceTransformationComment"),
    0x00640002: ("SQ", "DeformableRegistrationSequence"),
    0x00640003: ("UI", "SourceFrameOfReferenceUID"),
    0x00640005: ("SQ", "DeformableRegistrationGridSequence"),
    0x00640007: ("UL", "GridDimensions"),
    0x00640008: ("FD", "GridResolution"),
    0x00640009: ("OF", "VectorGridData"),
    0x0064000F: ("SQ", "PreDeformationMatrixRegistrationSequence"),
    0x00640010: ("SQ", "PostDeformationMatrixRegistrationSequence"),
    # pixel data
    0x7FE00008: ("OF", "FloatPixelData"),
    0x7FE00009: ("OD", "DoubleFloatPixelData"),
    0x7FE00010: ("OW", "PixelData"),
}

# remove accidental helper entry
TAG_DICT.pop(0x30060C6, None)

KEYWORD_TO_TAG = {kw: tag for tag, (vr, kw) in TAG_DICT.items()}


def tag_to_vr(tag):
    entry = TAG_DICT.get(tag)
    if entry is not None:
        return entry[0]
    # private / unknown tags
    return "UN"


def tag_to_keyword(tag):
    entry = TAG_DICT.get(tag)
    return entry[1] if entry is not None else None


def keyword_to_tag(keyword):
    return KEYWORD_TO_TAG.get(keyword)
